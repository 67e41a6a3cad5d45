package graft.common

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Secret redaction (reference getl/logging.py SecretWordFilter). */
class RedactSpec extends AnyFunSuite {

  test("password / secret / connurl values are redacted") {
    assert(Redact("Password: hunter2 rest") === "Password: #redacted# rest")
    assert(Redact("'secret': abc123'") === "'secret': #redacted#")
    assert(Redact("ConnUrl: jdbc:postgresql://h/db x") ===
      "ConnUrl: #redacted# x")
  }

  test("non-secret text passes through untouched") {
    val msg = "loaded 42 files from s3a://bucket/prefix"
    assert(Redact(msg) === msg)
  }
}

/** Hadoop-FS utilities (reference getl/common/utils.py, s3path.py). */
class FsUtilsSpec extends SparkSuite {

  private def tmp(): String = Files.createTempDirectory("graft-fs").toString

  test("write / read / list / copy / delete round-trip") {
    val w = tmp()
    FsUtils.writeText(spark, s"$w/a/one.txt", "1")
    FsUtils.writeText(spark, s"$w/a/two.json", "2")
    assert(FsUtils.readText(spark, s"$w/a/one.txt") === "1")
    assert(FsUtils.listFiles(spark, s"$w/a").size === 2)
    assert(FsUtils.listFiles(spark, s"$w/a", ".json").map(_.split('/').last) ===
      Seq("two.json"))
    // copy_keys then copy_and_cleanup (reference utils.py:76-117)
    FsUtils.copyKeys(spark, Seq((s"$w/a/one.txt", s"$w/b/one.txt")))
    assert(FsUtils.readText(spark, s"$w/b/one.txt") === "1")
    FsUtils.copyAndCleanup(spark, Seq((s"$w/a/two.json", s"$w/b/two.json")))
    assert(!FsUtils.exists(spark, s"$w/a/two.json"))
    assert(FsUtils.exists(spark, s"$w/b/two.json"))
    FsUtils.deleteFiles(spark, Seq(s"$w/b"))
    assert(!FsUtils.exists(spark, s"$w/b"))
  }

  test("writeTextIfAbsent: exactly one of N racing writers wins") {
    val w = tmp()
    val target = s"$w/commit/0.json"
    val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
    try {
      val futures = (1 to 16).map { i =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = FsUtils.writeTextIfAbsent(spark, target, s"writer-$i")
        })
      }
      val wins = futures.zipWithIndex.filter(_._1.get())
      assert(wins.size === 1, s"expected exactly one winner, got ${wins.size}")
      // the surviving content is the winner's, complete and uncorrupted
      assert(FsUtils.readText(spark, target) === s"writer-${wins.head._2 + 1}")
      // losers' tmp files are cleaned up
      assert(FsUtils.listFiles(spark, s"$w/commit").size === 1)
    } finally pool.shutdown()
    // a later put-if-absent still loses
    assert(!FsUtils.writeTextIfAbsent(spark, target, "late"))
  }

  test("copy of a missing source raises FileNotFoundException") {
    val w = tmp()
    intercept[java.io.FileNotFoundException] {
      FsUtils.copyKeys(spark, Seq((s"$w/nope.txt", s"$w/out.txt")))
    }
  }
}
