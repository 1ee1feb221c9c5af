package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{BloomAgg, BloomFns, BottomKAgg, BucketHistAgg, FloatVectorDot, MinHashAgg, PrefixByFreq, ShingleHashes, SignBands, SortedIntersectCount}

/** ScalaCheck laws for the hand-written native kernels, checked against
  * straightforward Scala models over random inputs (interpreted eval path —
  * the codegen path is covered by the pipeline specs and FloatVectorDotSpec's
  * HOF-equality run). */
class KernelLawsSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }


  private def arr(xs: Seq[Long]) = ArrayData.toArrayData(xs.toArray)

  test("SortedIntersectCount == |set intersection| on sorted distinct arrays") {
    val gen = Gen.listOf(Gen.chooseNum(-1000L, 1000L))
    check(forAll(gen, gen) { (a: List[Long], b: List[Long]) =>
      val sa = a.distinct.sorted
      val sb = b.distinct.sorted
      val got = SortedIntersectCount(
        Literal(arr(sa), ArrayType(LongType)),
        Literal(arr(sb), ArrayType(LongType))).eval(null).asInstanceOf[Long]
      got == sa.toSet.intersect(sb.toSet).size.toLong
    })
  }

  test("ShingleHashes: sorted, distinct, and = hashes of the model shingle set") {
    val asciiText = Gen.listOf(Gen.frequency(
      9 -> Gen.alphaLowerChar, 1 -> Gen.const(' '))).map(_.mkString)
    check(forAll(asciiText) { (text: String) =>
      val out = ShingleHashes(Literal(UTF8String.fromString(text), StringType), 5)
        .eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
      val model = text.sliding(5).filter(_.length == 5).toSeq
        .map { w =>
          w.getBytes("UTF-8").foldLeft(0L)((h, b) => h * 0x100000001b3L + (b & 0xffL))
        }.distinct.sorted
      out == model
    })
  }

  test("MinHashAgg lanes == elementwise min of the affine model; merge is min") {
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(1L, 100000L))
    check(forAll(gen, gen) { (xs: List[Long], ys: List[Long]) =>
      import MinHashAgg.{A, B, K, P}
      def model(zs: List[Long]): Seq[Long] =
        (0 until K).map(i => zs.map(x => (A(i) * x + B(i)) % P).min)
      val agg = MinHashAgg(BoundReference(0, LongType, nullable = false))
      def fold(zs: List[Long]): Array[Long] =
        zs.foldLeft(agg.createAggregationBuffer()) { (buf, x) =>
          agg.update(buf, org.apache.spark.sql.catalyst.InternalRow(x))
        }
      val bx = fold(xs)
      val by = fold(ys)
      val mergedModel = model(xs).zip(model(ys)).map { case (p, q) => math.min(p, q) }
      fold(xs).toSeq == model(xs) &&
        agg.merge(bx, by).toSeq == mergedModel &&
        agg.deserialize(agg.serialize(by)).toSeq == model(ys)
    })
  }

  test("BottomKAgg == sorted distinct take(k); permutation-invariant; merge law") {
    val gen = Gen.listOf(Gen.chooseNum(-10000L, 10000L))
    val kGen = Gen.chooseNum(1, 16)
    check(forAll(gen, gen, kGen) { (xs: List[Long], ys: List[Long], k: Int) =>
      val agg = BottomKAgg(BoundReference(0, LongType, nullable = false), k)
      def fold(zs: List[Long]): BottomKAgg.Buf =
        zs.foldLeft(agg.createAggregationBuffer()) { (buf, x) =>
          agg.update(buf, org.apache.spark.sql.catalyst.InternalRow(x))
        }
      def model(zs: List[Long]): Seq[Long] = zs.distinct.sorted.take(k)
      def out(b: BottomKAgg.Buf): Seq[Long] = b.a.take(b.n).toSeq
      out(fold(xs)) == model(xs) &&
        // pure function of the SET: any permutation folds identically
        out(fold(scala.util.Random.javaRandomToRandom(
          new java.util.Random(42)).shuffle(xs))) == model(xs) &&
        // merge law: k-min of union == k-min of merged sketches
        out(agg.merge(fold(xs), fold(ys))) == model(xs ++ ys) &&
        // serde roundtrip preserves the sketch
        out(agg.deserialize(agg.serialize(fold(ys)))) == model(ys)
    })
  }

  test("BloomAgg: no false negatives, merge is OR, roundtrips, low FP rate") {
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
    check(forAll(gen, gen) { (xs: List[Long], ys: List[Long]) =>
      val agg = BloomAgg(BoundReference(0, LongType, nullable = false))
      def fold(zs: List[Long]): Array[Long] =
        zs.foldLeft(agg.createAggregationBuffer()) { (buf, x) =>
          agg.update(buf, org.apache.spark.sql.catalyst.InternalRow(x))
        }
      val bx = fold(xs)
      val by = fold(ys)
      val merged = agg.merge(bx.clone(), by)
      def bits(b: Array[Long]) = ArrayData.toArrayData(b)
      // no false negatives, on the built side and after merge/serde
      xs.forall(x => BloomFns.mightContain(bits(bx), x)) &&
        (xs ++ ys).forall(x => BloomFns.mightContain(bits(merged), x)) &&
        agg.deserialize(agg.serialize(bx)).toSeq == bx.toSeq &&
        // determinism: rebuilding from the same input gives identical bits
        fold(xs).toSeq == bx.toSeq
    })
    // false-positive rate at the designed load: ~10k keys in 2^17 bits / 5
    // probes should misfire well under 1% on keys never inserted
    val agg = BloomAgg(BoundReference(0, LongType, nullable = false))
    val built = (1L to 10000L).foldLeft(agg.createAggregationBuffer()) {
      (buf, x) => agg.update(buf, org.apache.spark.sql.catalyst.InternalRow(x))
    }
    val bitsArr = ArrayData.toArrayData(built)
    val fp = (1000001L to 1010000L).count(BloomFns.mightContain(bitsArr, _))
    assert(fp < 100, s"false-positive count too high: $fp / 10000")
  }

  test("FloatVectorDot == sequential double fold, symmetric") {
    val vec = Gen.listOfN(16, Gen.chooseNum(-100f, 100f))
    check(forAll(vec, vec) { (a: List[Float], b: List[Float]) =>
      def lit(xs: List[Float]) =
        Literal(ArrayData.toArrayData(xs.toArray), ArrayType(FloatType))
      val got = FloatVectorDot(lit(a), lit(b)).eval(null).asInstanceOf[Double]
      val sym = FloatVectorDot(lit(b), lit(a)).eval(null).asInstanceOf[Double]
      val model = a.zip(b).foldLeft(0.0) { case (s, (x, y)) =>
        s + x.toDouble * y.toDouble
      }
      got == model && sym == model
    })
  }

  test("PrefixByFreq == sortBy((freq, sh)).take(k) model") {
    val shsGen = Gen.listOf(Gen.chooseNum(-5000L, 5000L)).map(_.distinct)
    val freqGen = Gen.listOfN(16, Gen.chooseNum(0, 40))
    val thetaGen = Gen.oneOf(0.5, 0.8, 0.9, 1.0)
    check(forAll(shsGen, freqGen, thetaGen) {
      (shs: List[Long], fs: List[Int], theta: Double) =>
        val freqs = fs.toArray
        val got = PrefixByFreq(
          Literal(arr(shs), ArrayType(LongType)),
          Literal(ArrayData.toArrayData(freqs),
            ArrayType(org.apache.spark.sql.types.IntegerType)),
          theta).eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
        val n = shs.length
        val k = math.min(n - math.ceil(theta * n).toInt + 1, n)
        val model =
          shs.sortBy(sh => (freqs(sh.toInt & 15).toLong, sh)).take(math.max(k, 0))
        got == model
    })
  }

  test("BucketHistAgg == exploded bucket counts; merge adds, saturating") {
    val gen = Gen.listOf(Gen.listOf(Gen.chooseNum(-5000L, 5000L)))
    check(forAll(gen, gen) { (xs: List[List[Long]], ys: List[List[Long]]) =>
      val bits = 4
      val agg = BucketHistAgg(
        BoundReference(0, ArrayType(LongType), nullable = false), bits)
      def fold(rows: List[List[Long]]): Array[Int] =
        rows.foldLeft(agg.createAggregationBuffer()) { (buf, r) =>
          agg.update(buf, org.apache.spark.sql.catalyst.InternalRow(arr(r)))
        }
      def model(rows: List[List[Long]]): Seq[Int] =
        (0 until (1 << bits)).map(b =>
          rows.flatten.count(sh => (sh.toInt & 15) == b))
      val sat = {
        val b1 = agg.createAggregationBuffer(); b1(0) = Int.MaxValue - 1
        val b2 = agg.createAggregationBuffer(); b2(0) = 5
        agg.merge(b1, b2)(0) == Int.MaxValue
      }
      fold(xs).toSeq == model(xs) &&
        agg.merge(fold(xs), fold(ys)).toSeq ==
          model(xs).zip(model(ys)).map { case (p, q) => p + q } &&
        agg.deserialize(agg.serialize(fold(ys))).toSeq == model(ys) && sat
    })
  }

  test("SignBands == per-band sign-bit fold; short vectors pad bit 0") {
    val vecGen = Gen.choose(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(Gen.chooseNum(-10f, 10f), Gen.const(0f),
        Gen.const(Float.NaN))))
    check(forAll(vecGen) { (v: List[Float]) =>
      val nBands = 3; val width = 8
      val got = SignBands(
        Literal(ArrayData.toArrayData(v.toArray), ArrayType(FloatType)),
        nBands, width).eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
      val model = (0 until nBands).map { t =>
        (0 until width).foldLeft(0L) { (bv, i) =>
          val d = t * width + i
          val set = d < v.length && (v(d) > 0f || v(d).isNaN)
          if (set) bv | (1L << i) else bv
        }
      }
      got == model
    })
  }

  test("FloatVectorDot double arrays match float arrays widened") {
    val vec = Gen.listOfN(8, Gen.chooseNum(-10f, 10f))
    check(forAll(vec) { (a: List[Float]) =>
      val f = Literal(ArrayData.toArrayData(a.toArray), ArrayType(FloatType))
      val d = Literal(ArrayData.toArrayData(a.map(_.toDouble).toArray),
        ArrayType(DoubleType))
      // float→double widening is exact, so the two paths must agree bitwise
      FloatVectorDot(f, f).eval(null) == FloatVectorDot(d, d).eval(null)
    })
  }
}
