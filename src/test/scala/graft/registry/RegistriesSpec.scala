package graft.registry

import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite

class RegistriesSpec extends AnyFunSuite {

  test("prefix enumeration at day granularity formats hive-style paths") {
    val out = DatePrefixScan.enumeratePrefixes(
      "year=%Y/month=%m/day=%d",
      LocalDateTime.parse("2021-12-30T00:00:00"),
      LocalDateTime.parse("2022-01-02T00:00:00"))
    assert(out.map(_._2) === Seq(
      "year=2021/month=12/day=30",
      "year=2021/month=12/day=31",
      "year=2022/month=01/day=01",
      "year=2022/month=01/day=02"))
  }

  test("granularity is the finest strftime code present") {
    val months = DatePrefixScan.enumeratePrefixes(
      "%Y/%m",
      LocalDateTime.parse("2021-11-01T00:00:00"),
      LocalDateTime.parse("2022-01-01T00:00:00"))
    assert(months.map(_._2) === Seq("2021/11", "2021/12", "2022/01"))

    val hours = DatePrefixScan.enumeratePrefixes(
      "%Y%m%d/%H",
      LocalDateTime.parse("2022-01-01T22:00:00"),
      LocalDateTime.parse("2022-01-02T01:00:00"))
    assert(hours.map(_._2) === Seq(
      "20220101/22", "20220101/23", "20220102/00", "20220102/01"))
  }

  test("format with no strftime codes is rejected") {
    assertThrows[IllegalArgumentException](
      DatePrefixScan.enumeratePrefixes("static",
        LocalDateTime.now(), LocalDateTime.now()))
  }
}
