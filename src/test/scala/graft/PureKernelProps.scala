package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{SimHash64, VectorMeanAgg}
import graft.operators.{KMeans, PCA}

/** Property-based checks of the pure (non-Spark-session) kernels:
  * Jacobi eigendecomposition, the native SimHash kernel, the distance
  * metric, and the mean-aggregator algebra. scalacheck runs these
  * under sbt's native ScalaCheck framework — no session, thousands of
  * cases in milliseconds. */
object PureKernelProps extends Properties("pure-kernels") {

  // ── eigSym on random symmetric matrices ──────────────────────────

  private val symMat: Gen[Array[Array[Double]]] = for {
    d <- Gen.choose(2, 6)
    vals <- Gen.listOfN(d * d, Gen.choose(-10.0, 10.0))
  } yield {
    val m = vals.toArray.grouped(d).toArray
    Array.tabulate(d, d)((i, j) => (m(i)(j) + m(j)(i)) / 2.0)
  }

  property("eigSym: A·v = λ·v, orthonormal, Σλ = trace") = Prop.forAll(symMat) { a =>
    val d = a.length
    val (values, vectors) = PCA.eigSym(a)
    val scale = math.max(1.0, a.map(_.map(math.abs).max).max)
    val eigenEq = (0 until d).forall { c =>
      (0 until d).forall { i =>
        val av = (0 until d).map(j => a(i)(j) * vectors(c)(j)).sum
        math.abs(av - values(c) * vectors(c)(i)) < 1e-8 * scale
      }
    }
    val ortho = (0 until d).forall { c1 =>
      (0 until d).forall { c2 =>
        val dot = (0 until d).map(i => vectors(c1)(i) * vectors(c2)(i)).sum
        math.abs(dot - (if (c1 == c2) 1.0 else 0.0)) < 1e-9
      }
    }
    val trace = (0 until d).map(i => a(i)(i)).sum
    val traceOk = math.abs(values.sum - trace) < 1e-8 * scale * d
    val sorted = values.sliding(2).forall(w => w.length < 2 || w(0) >= w(1) - 1e-12)
    eigenEq && ortho && traceOk && sorted
  }

  // ── native SimHash kernel ────────────────────────────────────────

  private def arr(toks: Seq[String]): GenericArrayData =
    new GenericArrayData(toks.map(t => UTF8String.fromString(t): Any).toArray)

  private val tokList: Gen[List[String]] =
    Gen.listOfN(12, Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)).map(_.take(12))

  property("simhash64: order-invariant, deterministic, 16 lowercase hex") =
    Prop.forAll(tokList, Gen.long) { (toks, seed) =>
      val fp1 = SimHash64.compute(arr(toks)).toString
      val shuffled = new scala.util.Random(seed).shuffle(toks)
      val fp2 = SimHash64.compute(arr(shuffled)).toString
      fp1 == fp2 && fp1.length == 16 && fp1.forall("0123456789abcdef".contains(_))
    }

  property("simhash64: duplicating every token preserves the fingerprint") =
    Prop.forAll(tokList) { toks =>
      // votes double but every sign (incl. the zero-vote 0-bias) is
      // preserved: 2v > 0 iff v > 0
      SimHash64.compute(arr(toks ++ toks)).toString ==
        SimHash64.compute(arr(toks)).toString
    }

  // ── distance metric axioms ───────────────────────────────────────

  private val vecPair: Gen[(Array[Double], Array[Double], Array[Double])] = for {
    d <- Gen.choose(1, 8)
    a <- Gen.listOfN(d, Gen.choose(-100.0, 100.0))
    b <- Gen.listOfN(d, Gen.choose(-100.0, 100.0))
    c <- Gen.listOfN(d, Gen.choose(-100.0, 100.0))
  } yield (a.toArray, b.toArray, c.toArray)

  property("euclideanLocal: identity, exact symmetry, triangle inequality") =
    Prop.forAll(vecPair) { case (a, b, c) =>
      val ab = KMeans.euclideanLocal(a, b)
      KMeans.euclideanLocal(a, a) == 0.0 &&
        ab == KMeans.euclideanLocal(b, a) && // (x-y)² == (y-x)² bitwise
        ab <= KMeans.euclideanLocal(a, c) + KMeans.euclideanLocal(c, b) + 1e-9
    }

  // ── winnowing detection guarantee ────────────────────────────────

  private def localWinnowSet(text: String, k: Int, w: Int): Set[Long] = {
    val P = 2147483647L
    val m = text.length - (k - 1)
    if (m < 1) Set.empty
    else {
      val hs = (0 until m).map(i =>
        text.substring(i, i + k).foldLeft(0L)((a, c) => (a * 31 + c.toLong) % P))
      val mins = if (m <= w) Seq(hs.min) else (0 to m - w).map(j => hs.slice(j, j + w).min)
      mins.toSet
    }
  }

  private val asciiStr: Gen[String] =
    Gen.choose(0, 120).flatMap(n => Gen.listOfN(n, Gen.alphaChar).map(_.mkString))

  property("winnow: shared substring of length >= w+k-1 shares a fingerprint") =
    Prop.forAll(asciiStr, asciiStr, Gen.listOfN(8, Gen.alphaChar).map(_.mkString)) {
      (pre, post, core) =>
        // core length 8 = w + k - 1 for (k=5, w=4)
        val a = localWinnowSet(pre + core + post, 5, 4)
        val b = localWinnowSet(post + core + pre, 5, 4)
        a.intersect(b).nonEmpty
    }

  // ── native WinnowMins kernel vs pure reference ───────────────────

  private def localWinnowList(text: String, k: Int, w: Int): Seq[Long] = {
    val P = 2147483647L
    val cps = text.codePoints().toArray
    val m = cps.length - (k - 1)
    if (m < 1) Seq.empty
    else {
      val hs = (0 until m).map(i =>
        (i until i + k).foldLeft(0L)((a, j) => (a * 31 + cps(j)) % P))
      if (m <= w) Seq(hs.min) else (0 to m - w).map(j => hs.slice(j, j + w).min)
    }
  }

  private val mixedChar: Gen[Char] = Gen.frequency(
    8 -> Gen.alphaNumChar, 1 -> Gen.oneOf(' ', '\t', ','),
    1 -> Gen.oneOf('é', 'ß', '東', '京', 'λ'))
  private val mixedStr: Gen[String] =
    Gen.choose(0, 80).flatMap(n => Gen.listOfN(n, mixedChar).map(_.mkString))

  property("WinnowMins kernel: ordered minima equal the pure code-point reference") =
    Prop.forAll(mixedStr, Gen.choose(1, 6), Gen.choose(1, 6)) { (s, k, w) =>
      val got = graft.functions.WinnowMins.compute(UTF8String.fromString(s), k, w)
        .toLongArray().toSeq
      got == localWinnowList(s, k, w)
    }

  // ── native Shingles / MinHashSig kernels vs pure references ──────

  private val spacyStr: Gen[String] =
    Gen.choose(0, 60).flatMap(n => Gen.listOfN(n,
      Gen.frequency(5 -> Gen.alphaNumChar, 2 -> Gen.const(' '),
        1 -> Gen.oneOf('é', '東'))).map(_.mkString))

  private def refShingles(text: String, n: Int): Seq[String] = {
    val toks = text.split(" ", -1) // Java regex, limit -1: trailing empties kept
    if (toks.length < n) Seq.empty
    else toks.sliding(n).map(_.mkString(" ")).toSeq.distinct
  }

  property("Shingles kernel matches the regex-split reference incl. space runs") =
    Prop.forAll(spacyStr, Gen.choose(1, 4)) { (s, n) =>
      val got = graft.functions.Shingles.compute(UTF8String.fromString(s), n)
        .array.map(_.toString).toSeq
      got == refShingles(s, n)
    }

  private def refMinhash(toks: Seq[String], h: Int): Seq[Long] = {
    val P = 2147483647L
    val md = java.security.MessageDigest.getInstance("MD5")
    val xs = toks.map { t =>
      val d = md.digest(t.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    (1 to h).map(i => xs.map(x => ((1299721L * i + 7L) * x + 104729L * i) % P).min)
  }

  property("MinHashSig kernel (parity mode) matches the pure md5 reference") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)),
      Gen.choose(1, 24)) { (toks, h) =>
      val got = graft.functions.MinHashSig.compute(arr(toks), h, parity = true)
        .toLongArray().toSeq
      got == refMinhash(toks, h)
    }

  // ── VectorMeanAgg algebra ────────────────────────────────────────

  private val vecGroup: Gen[(List[Array[Double]], Int)] = for {
    d <- Gen.choose(1, 5)
    n <- Gen.choose(1, 20)
    vs <- Gen.listOfN(n, Gen.listOfN(d, Gen.choose(-50.0, 50.0)).map(_.toArray))
    split <- Gen.choose(0, n)
  } yield (vs, split)

  property("VectorMeanAgg: split-reduce-merge equals whole-reduce (partial-agg algebra)") =
    Prop.forAll(vecGroup) { case (vs, split) =>
      val agg = new VectorMeanAgg
      def reduceAll(xs: Seq[Array[Double]]) =
        xs.foldLeft(agg.zero)((b, v) => agg.reduce(b, v.clone()))
      val whole = agg.finish(reduceAll(vs))
      val (l, r) = vs.splitAt(split)
      val merged = agg.finish(agg.merge(reduceAll(l), reduceAll(r)))
      whole.zip(merged).forall { case (x, y) => math.abs(x - y) < 1e-9 }
    }
}
