package graft

import graft.functions.{HashKernels, UnionNormalize}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Property tests over the pure kernels (no Spark session needed); sampling
  * loop over ScalaCheck generators (no scalatest-plus bridge offline). */
class PropertySpec extends AnyFunSuite {

  test("week mode 3 equals ISO week-of-year over random dates") {
    import java.time.LocalDate
    import java.time.temporal.WeekFields
    val wf = WeekFields.ISO
    val rnd = new scala.util.Random(11)
    (1 to 3000).foreach { _ =>
      val epochDay = rnd.between(7305, 25567) // 1990-01-01 .. 2039-12-31
      val d = LocalDate.ofEpochDay(epochDay.toLong)
      val iso = d.get(wf.weekOfWeekBasedYear)
      val isoYear = d.get(wf.weekBasedYear)
      assert(graft.functions.DateKernels.week(epochDay, 3) == iso,
        s"week mode 3 vs ISO at $d")
      assert(graft.functions.DateKernels.yearweek(epochDay, 3) ==
        isoYear * 100 + iso, s"yearweek mode 3 vs ISO at $d")
    }
  }

  test("week modes agree on shared invariants over random dates") {
    val rnd = new scala.util.Random(13)
    (1 to 3000).foreach { _ =>
      val epochDay = rnd.between(7305, 25567)
      (0 to 7).foreach { m =>
        val w = graft.functions.DateKernels.week(epochDay, m)
        assert(w >= 0 && w <= 53, s"week $w out of range (mode $m)")
        // NO_ZERO modes (2,3,6,7) never return week 0
        if ((m & 2) != 0) assert(w >= 1, s"mode $m returned week 0")
      }
    }
  }

  private def forAll[A](g: Gen[A], n: Int = 100)(f: A => Unit): Unit =
    (1 to n).foreach { i =>
      g.sample.foreach(f)
    }
  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    (1 to 100).foreach { _ =>
      for (a <- g1.sample; b <- g2.sample) f(a, b)
    }

  private def arr(tokens: Seq[String]): GenericArrayData =
    new GenericArrayData(tokens.map(t => UTF8String.fromString(t)).toArray)

  private val tokenGen = Gen.nonEmptyListOf(
    Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(12)))

  test("simhash is permutation- and duplication-insensitive only in vote sign") {
    forAll(tokenGen) { toks =>
      val h1 = HashKernels.simhash(arr(toks))
      val h2 = HashKernels.simhash(arr(scala.util.Random.shuffle(toks)))
      assert(h1 == h2, "simhash must not depend on token order")
    }
  }

  test("minhash signature of identical sets is identical; jaccard bounds hold") {
    forAll(tokenGen, tokenGen) { (a, b) =>
      val sa = HashKernels.minhash(arr(a), 64).toLongArray()
      val sb = HashKernels.minhash(arr(b), 64).toLongArray()
      val sa2 = HashKernels.minhash(arr(scala.util.Random.shuffle(a)), 64)
        .toLongArray()
      assert(sa.sameElements(sa2))
      val matches = sa.zip(sb).count { case (x, y) => x == y }
      if (a.toSet == b.toSet) assert(matches == 64)
      if (a.toSet.intersect(b.toSet).isEmpty && a.nonEmpty && b.nonEmpty) {
        // disjoint sets should rarely agree; allow a small fluke margin
        assert(matches <= 8, s"disjoint sets matched $matches/64")
      }
    }
  }

  test("fingerprint is injective on small strings w.r.t. prefix extension") {
    forAll(Gen.alphaNumStr, Gen.alphaNumStr) { (s, t) =>
      val f = (x: String) => HashKernels.fingerprint(UTF8String.fromString(x))
      if (s != t && s.length <= 8 && t.length <= 8) {
        // 64-bit polynomial hash is collision-free on <=8 ASCII chars
        assert(f(s) != f(t))
      }
      assert(f(s) == f(s))
    }
  }

  test("union promotion is commutative and idempotent over the lattice") {
    val types: Gen[DataType] = Gen.oneOf(IntegerType, LongType, DoubleType,
      FloatType, StringType, DecimalType(10, 2), DecimalType(20, 4),
      DateType, TimestampType, NullType)
    forAll(types, types) { (a, b) =>
      assert(UnionNormalize.promote(a, b) == UnionNormalize.promote(b, a))
      assert(UnionNormalize.promote(a, a) == a)
      // promotion result absorbs both inputs
      val p = UnionNormalize.promote(a, b)
      assert(UnionNormalize.promote(p, a) == p)
      assert(UnionNormalize.promote(p, b) == p)
    }
  }

  test("mysql period arithmetic round-trips") {
    val periods = for {
      y <- Gen.choose(1900, 2100); m <- Gen.choose(1, 12)
    } yield y * 100L + m
    forAll(periods, Gen.choose(-500, 500)) { (p, n) =>
      // periodAdd/periodDiff are Column functions; check the algebra on the
      // same formula used in the implementation
      def toMonths(p: Long) = (p / 100) * 12 + (p % 100) - 1
      def fromMonths(t: Long) = (t / 12) * 100 + (t % 12) + 1
      val shifted = fromMonths(toMonths(p) + n)
      if (n >= 0 || toMonths(p) + n >= 0) {
        assert(toMonths(shifted) - toMonths(p) == n)
      }
    }
  }

  test("png codec round-trips arbitrary grayscale images") {
    val dims = for {
      w <- Gen.choose(1, 80)
      h <- Gen.choose(1, 40)
    } yield (w, h)
    forAll(dims, Gen.choose(Long.MinValue, Long.MaxValue)) {
      case ((w, h), seed) =>
        val rng = new scala.util.Random(seed)
        val px = Array.fill(h, w)(rng.nextInt(256))
        val png = graft.functions.PngCodec.encodeGray(w, h, (x, y) => px(y)(x))
        val (dw, dh, out) = graft.functions.PngCodec.decodeGray(png)
        assert(dw == w && dh == h, s"dims ${dw}x$dh != ${w}x$h")
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            assert((out(y * w + x) & 0xff) == px(y)(x),
              s"pixel ($x,$y) of ${w}x$h seed=$seed")
            x += 1
          }
          y += 1
        }
    }
  }
}
