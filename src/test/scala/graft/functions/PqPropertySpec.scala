package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

/** Seeded-random property tests for the PQ math kernels against naive
  * driver-side re-implementations (the TrajectoryPropertySpec style) —
  * exercised directly on [[PqMath]] so they cover the same code the
  * codegen path calls, without a Spark session. */
class PqPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(271828)

  private def randModel(m: Int, subDim: Int, nlist: Int): PqModel =
    new PqModel(m, subDim,
      Array.fill(m)(Array.fill(nlist)(Array.fill(subDim)(rnd.nextGaussian()))))

  private def randVec(dim: Int): Array[Double] =
    Array.fill(dim)(rnd.nextGaussian())

  private def arr(v: Array[Double]) =
    new GenericArrayData(v.map(x => x: Any))

  private def naiveEncode(v: Array[Double], model: PqModel): Array[Int] =
    Array.tabulate(model.m) { b =>
      val sub = v.slice(b * model.subDim, (b + 1) * model.subDim)
      val d2 = model.codebooks(b).map(c =>
        sub.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum)
      // ties to the lowest code — strict < keeps the first minimum
      d2.zipWithIndex.minBy { case (d, i) => (d, i) }._2
    }

  test("encode = per-block L2 argmin (200 random models × vectors)") {
    (1 to 200).foreach { _ =>
      val m = 1 + rnd.nextInt(4)
      val subDim = 1 + rnd.nextInt(6)
      val nlist = 1 + rnd.nextInt(9)
      val model = randModel(m, subDim, nlist)
      val v = randVec(m * subDim)
      val got = PqMath.encode(arr(v), model, floatElems = false)
      val want = naiveEncode(v, model)
      assert(got != null)
      assert((0 until m).forall(i => got.getInt(i) == want(i)),
        s"m=$m subDim=$subDim nlist=$nlist")
    }
  }

  test("adcDot = dot(q, reconstruction) within fp slack; reconNorm exact (200 samples)") {
    (1 to 200).foreach { _ =>
      val m = 1 + rnd.nextInt(4)
      val subDim = 1 + rnd.nextInt(6)
      val model = randModel(m, subDim, 1 + rnd.nextInt(9))
      val q = randVec(m * subDim)
      val v = randVec(m * subDim)
      val codes = PqMath.encode(arr(v), model, floatElems = false)
      val recon = (0 until m).flatMap(b =>
        model.codebooks(b)(codes.getInt(b))).toArray
      val adc = PqMath.adcDot(arr(q), codes, model, floatElems = false)
      val naive = q.zip(recon).map { case (a, b) => a * b }.sum
      assert(adc != null && math.abs(adc - naive) < 1e-9)
      val rn = PqMath.reconNorm(codes, model)
      val naiveRn = math.sqrt(recon.map(x => x * x).sum)
      assert(rn != null && math.abs(rn - naiveRn) < 1e-9)
      val base = randVec(m * subDim)
      val rnp = PqMath.reconNormPlus(arr(base), codes, model, baseFloat = false)
      val naiveRnp = math.sqrt(base.zip(recon)
        .map { case (x, y) => (x + y) * (x + y) }.sum)
      assert(rnp != null && math.abs(rnp - naiveRnp) < 1e-9)
    }
  }

  test("quantization error never grows with codebook size on the same data") {
    // a codebook containing the vector itself must encode losslessly
    (1 to 50).foreach { _ =>
      val m = 2
      val subDim = 4
      val v = randVec(m * subDim)
      val others = Array.fill(7)(randVec(m * subDim))
      val model = new PqModel(m, subDim,
        Array.tabulate(m)(b => (v +: others.toSeq).map(
          _.slice(b * subDim, (b + 1) * subDim)).toArray))
      val codes = PqMath.encode(arr(v), model, floatElems = false)
      assert((0 until m).forall(b => codes.getInt(b) == 0),
        "self-seeded codebook must pick the exact code word")
    }
  }
}
