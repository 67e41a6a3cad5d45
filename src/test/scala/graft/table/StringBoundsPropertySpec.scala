package graft.table

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.unsafe.types.UTF8String

import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the footer string-bounds helpers ([[DataSkipping
  * .validUtf8Prefix]] / [[DataSkipping.incrementLastCodePoint]]) — the two
  * pure functions whose soundness the string data-skipping path rests on.
  * A wrong min/max bound silently MIS-PRUNES (drops files whose rows
  * match), so the invariants are checked over arbitrary unicode including
  * supplementary planes and writer-style byte truncation. (Plain
  * ScalaCheck generators with fixed seeds, like PredicatePropertySpec —
  * the scalatest-scalacheck bridge isn't on the classpath.)
  */
class StringBoundsPropertySpec extends AnyFunSuite {

  private def u(s: String) = UTF8String.fromString(s)

  // arbitrary unicode strings, biased toward the hazardous regions:
  // ASCII boundaries, multi-byte chars, surrogate-adjacent code points,
  // supplementary plane (emoji), and U+10FFFF itself
  private val cpGen: Gen[Int] = Gen.frequency(
    4 -> Gen.choose(0x20, 0x7F),
    2 -> Gen.choose(0x80, 0x7FF),
    2 -> Gen.choose(0x800, 0xD7FF),
    1 -> Gen.const(0xD7FF), // increment must skip the surrogate gap
    2 -> Gen.choose(0xE000, 0xFFFF),
    2 -> Gen.choose(0x10000, 0x10FFFF),
    1 -> Gen.const(0x10FFFF)) // increment must carry
  private val strGen: Gen[String] = for {
    n <- Gen.choose(0, 12)
    cps <- Gen.listOfN(n, cpGen)
  } yield new String(cps.toArray, 0, cps.length)

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  test("validUtf8Prefix of intact bytes round-trips the string exactly") {
    samples(strGen, 400, 11L).foreach { s =>
      val got = DataSkipping.validUtf8Prefix(u(s).getBytes)
      assert(got === Some(s), s"codepoints=${s.codePoints().toArray.toSeq}")
    }
  }

  test("validUtf8Prefix of truncated bytes is a byte-order lower bound") {
    val gen = for { s <- strGen; k <- Gen.choose(0, 50) } yield (s, k)
    samples(gen, 600, 23L).foreach { case (s, kRaw) =>
      val bytes = u(s).getBytes
      val k = math.min(kRaw, bytes.length)
      DataSkipping.validUtf8Prefix(bytes.take(k)).foreach { p =>
        // a prefix never exceeds the original in unsigned byte order,
        // and its bytes are literally a prefix of the original's
        assert(u(p).compareTo(u(s)) <= 0, s"p=$p s=$s k=$k")
        assert(u(s).getBytes.startsWith(u(p).getBytes))
      }
    }
  }

  test("incrementLastCodePoint strictly bounds every extension of its input") {
    val gen = for { s <- strGen; t <- strGen } yield (s, t)
    samples(gen, 600, 37L).foreach { case (s, t) =>
      DataSkipping.incrementLastCodePoint(s) match {
        case Some(w) =>
          // w > s and w > s+t for ANY suffix t — the upper-bound property
          // the widened max relies on (strings sharing the stored prefix
          // must all compare below the widened bound)
          assert(u(w).compareTo(u(s)) > 0, s"w=$w s=$s")
          assert(u(w).compareTo(u(s + t)) > 0, s"w=$w s=$s t=$t")
          // never lands in the surrogate gap (not a code point)
          assert(w.codePoints().toArray.forall(c => c < 0xD800 || c > 0xDFFF))
        case None =>
          // only the un-widenable inputs: empty or all-U+10FFFF
          assert(s.codePoints().toArray.forall(_ == 0x10FFFF))
      }
    }
  }

  test("writer truncation end-to-end: widened max bounds the true max") {
    // M = the file's true max value; the writer stores some byte
    // truncation of it (raw prefix OR the exact bytes); the published
    // bound validUtf8Prefix+increment must still sit ABOVE M
    val gen = for { m <- strGen; k <- Gen.choose(0, 60) } yield (m, k)
    samples(gen, 800, 53L).foreach { case (m, kRaw) =>
      val bytes = u(m).getBytes
      val k = math.min(kRaw, bytes.length)
      val widened = DataSkipping.validUtf8Prefix(bytes.take(k))
        .flatMap(DataSkipping.incrementLastCodePoint)
      widened.foreach { w =>
        assert(u(w).compareTo(u(m)) > 0,
          s"widened=$w does not bound trueMax=$m (stored ${k} of ${bytes.length} bytes)")
      }
    }
  }

  test("per-chunk widening before the byte-order reduce bounds multi-chunk files") {
    // round-10 review find: a raw-prefix-truncated chunk max compares LOW,
    // so it can lose the reduce to an exact-but-smaller chunk bound —
    // widening only the reduce winner then under-states the file max.
    // Concrete regression shape: chunk A true max "abz" stored "ab"
    // (truncated), chunk B max "abc" stored exactly.
    def widen(storedBytes: Array[Byte]): Option[String] =
      DataSkipping.validUtf8Prefix(storedBytes)
        .flatMap(DataSkipping.incrementLastCodePoint)
    val wrongOrder = // reduce stored bounds first, widen the winner
      widen(Seq("ab", "abc").maxBy(u)(Ordering.ordered[UTF8String]).getBytes).get
    assert(u(wrongOrder).compareTo(u("abz")) < 0) // the bug: bound < true max
    val rightOrder = // widen per chunk, then reduce — what bound() now does
      Seq(widen(u("ab").getBytes).get, widen(u("abc").getBytes).get)
        .maxBy(u)(Ordering.ordered[UTF8String])
    assert(u(rightOrder).compareTo(u("abz")) > 0)
    // property: for arbitrary chunk maxes with arbitrary truncations, the
    // per-chunk-widened maximum bounds the true file max
    val chunkGen = for {
      n <- Gen.choose(1, 5)
      ms <- Gen.listOfN(n, strGen.suchThat(_.nonEmpty))
      ks <- Gen.listOfN(n, Gen.choose(1, 60))
    } yield ms.zip(ks)
    samples(chunkGen, 400, 71L).foreach { chunks =>
      val trueMax = chunks.map(_._1).maxBy(u)(Ordering.ordered[UTF8String])
      val widened = chunks.map { case (m, kRaw) =>
        val bytes = u(m).getBytes
        widen(bytes.take(math.min(kRaw, bytes.length)))
      }
      if (widened.forall(_.isDefined)) {
        val fileMax = widened.flatten.maxBy(u)(Ordering.ordered[UTF8String])
        assert(u(fileMax).compareTo(u(trueMax)) > 0,
          s"fileMax=$fileMax trueMax=$trueMax chunks=$chunks")
      }
    }
  }

  test("explicit edges: empty, surrogate-adjacent, carry chain") {
    assert(DataSkipping.incrementLastCodePoint("") === None)
    assert(DataSkipping.incrementLastCodePoint("a") === Some("b"))
    // U+D7FF + 1 must skip the surrogate range to U+E000
    assert(DataSkipping.incrementLastCodePoint("퟿") === Some(""))
    // U+10FFFF carries into the previous code point
    val top = new String(Array(0x10FFFF), 0, 1)
    assert(DataSkipping.incrementLastCodePoint("a" + top) === Some("b"))
    assert(DataSkipping.incrementLastCodePoint(top + top) === None)
    assert(DataSkipping.validUtf8Prefix(Array[Byte]()) === Some(""))
    // a split 4-byte emoji truncates back to the valid boundary
    val emoji = u("x😀").getBytes // 1 + 4 bytes
    assert(DataSkipping.validUtf8Prefix(emoji.take(3)) === Some("x"))
    // garbage deeper than 3 trailing bytes stays invalid
    assert(DataSkipping.validUtf8Prefix(Array[Byte](0x41, -1, -1, -1, -1)) === None)
  }
}
