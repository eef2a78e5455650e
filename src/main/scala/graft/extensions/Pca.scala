package graft.extensions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Fixed-point top principal direction of an embedding corpus — the
  * dominant-axis signal a curation pipeline uses for outlier scoring,
  * duplicate-cluster axes, and curriculum ordering ("how far along the
  * corpus's main axis of variation does this document sit").
  *
  * Engine-exact by the same discipline as the graph family: embeddings
  * quantize to integers once (floor(x·qScale + 0.5) — the
  * embed_quantize recipe, identical IEEE ops in every engine), the
  * second-moment Gram matrix accumulates in EXACT integer arithmetic,
  * and the power iteration runs in integers with a truncating renorm —
  * so the resulting direction is bit-identical on any partitioning and
  * verifies against an arithmetic SQL oracle, where float PCA would
  * differ in the last ulp per summation order.
  *
  * The 100 TB shape: the Gram pass is ONE map-side-combinable custom
  * aggregate whose buffer is the d×d long matrix (d=64 → 32 KB — far
  * under any executor's memory, merged pairwise like any partial
  * aggregate); no n·d² explode, no shuffle beyond the single 1-row
  * aggregation. The d×d matvec iteration then runs driver-side in
  * BigInt — d²-bounded work, the same altitude as collecting IVF
  * centroids — and the final per-document projection is a broadcast
  * literal zip_with/aggregate, map-side codegen. Overflow is
  * IMPOSSIBLE to miss: the accumulator uses add/multiplyExact, so a
  * corpus too large for the quantization scale fails loudly instead
  * of wrapping (at |q| ≤ 594 — this corpus's range at qScale=1024 —
  * the Long budget covers ~2.6e13 rows; lower qScale to go past it).
  *
  * Uncentered second moment (not mean-centered covariance) by design:
  * one pass, and for normalized-ish embedding corpora the dominant
  * raw axis is the signal of interest; center upstream (subtract the
  * exact `embed_centroid` means) when covariance semantics are wanted.
  */
object Pca {

  /** One unit of eigenvector magnitude: components live in
    * [−Scale, Scale] after each renorm.
    */
  val Scale: Long = 1L << 20

  /** floor(x·qScale + 0.5) per component — exact in every engine. */
  def quantize(vec: Column, qScale: Long): Column =
    transform(vec, x =>
      floor(x.cast("double") * qScale + lit(0.5)).cast("long"))

  /** Distributed Gram accumulator: buffer = row-major d×d longs;
    * commutative/associative integer sums, overflow-exact.
    */
  final class GramAgg(d: Int)
      extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    def zero: Array[Long] = new Array[Long](d * d)
    def reduce(buf: Array[Long], q: Seq[Long]): Array[Long] = {
      require(q != null && q.length == d,
        s"vector of dim ${if (q == null) "null" else q.length.toString}" +
          s", expected $d")
      val qa = q.toArray
      var i = 0
      while (i < d) {
        val qi = qa(i)
        var j = 0
        while (j < d) {
          buf(i * d + j) = Math.addExact(buf(i * d + j),
            Math.multiplyExact(qi, qa(j)))
          j += 1
        }
        i += 1
      }
      buf
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
      a
    }
    def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
    def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }

  /** Driver power iteration on the collected Gram, exact BigInt
    * arithmetic (matvec values exceed Long; BigInt `/` truncates
    * toward zero — the SQL oracle mirrors it with a sign-split floor
    * division). Deterministic start: the BASIS vector at the largest
    * Gram diagonal (smallest index on ties) — an all-ones start is
    * annihilated by any Gram whose rows sum to zero (e.g. every
    * vector ∝ (1,−1): a perfectly well-posed corpus would crash as
    * "zero Gram"), whereas G·e_i contains the max diagonal itself,
    * and from step 2 on v sits in range(G), which for symmetric G
    * meets null(G) only at 0 — so the renorm max only vanishes when
    * the Gram is genuinely zero. (The generic power-iteration caveat
    * remains: a start exactly orthogonal to the top eigenvector
    * converges to a minor axis; with the max-energy basis start that
    * requires the dominant direction to have zero weight on the
    * corpus's highest-energy dimension — contrived for real
    * embedding corpora, and deterministic when it does happen.)
    */
  def powerIterate(gram: Seq[Long], d: Int, iterations: Int)
      : Seq[Long] =
    powerIterateBig(gram.map(BigInt(_)).toIndexedSeq, d, iterations)

  /** [[powerIterate]] over a BigInt Gram — the form the deflated
    * matrices take (deflation grows no magnitudes here, but the
    * residual entries are differences that need not fit a Long in
    * general).
    */
  def powerIterateBig(gram: IndexedSeq[BigInt], d: Int,
                      iterations: Int): Seq[Long] = {
    require(gram.length == d * d, s"gram must be $d x $d")
    require(iterations >= 1 && iterations <= 64, "fixed budget")
    val start = (0 until d).maxBy(i => (gram(i * d + i), -i))
    var v = Array.tabulate(d)(i =>
      if (i == start) BigInt(Scale) else BigInt(0))
    for (_ <- 1 to iterations) {
      val w = Array.tabulate(d) { i =>
        var acc = BigInt(0)
        var j = 0
        while (j < d) { acc += gram(i * d + j) * v(j); j += 1 }
        acc
      }
      val m = w.map(_.abs).max
      require(m.signum != 0,
        "zero Gram matrix (all-zero corpus) has no principal direction")
      v = w.map(x => x * Scale / m)
    }
    v.map(_.toLong)
  }

  /** Hotelling deflation with TWO-STAGE truncating division —
    * G ← G − λvvᵀ where λ = (vᵀGv)/(vᵀv), carried out as
    * u_i = trunc(α·v_i / β), c_ij = trunc(u_i·v_j / β)
    * (α = vᵀGv, β = vᵀv; BigInt `/` truncates toward zero, and the
    * SQL oracle mirrors it with a sign-split floor division). The
    * two-stage form is load-bearing for the oracle: the one-shot
    * numerator α·v_i·v_j overflows even HUGEINT at d=64/Scale=2²⁰
    * (≈2¹⁵² worst case), while each staged intermediate stays under
    * 2¹²⁶. The truncations mean the deflated matrix retains an O(1)
    * residual of v per entry — negligible against any genuine second
    * axis (λ₂ ≫ d), and DETERMINISTIC, which is the actual contract:
    * both engines compute the identical matrix, and ExtensionsSpec
    * checks the recovered second direction is near-orthogonal to the
    * first on a planted two-axis corpus.
    */
  def deflate(gram: IndexedSeq[BigInt], comp: Seq[Long], d: Int)
      : IndexedSeq[BigInt] = {
    require(gram.length == d * d && comp.length == d, "dims")
    val v = comp.map(BigInt(_)).toIndexedSeq
    val beta = v.map(x => x * x).sum
    require(beta.signum != 0, "cannot deflate by the zero vector")
    val alpha = (0 until d).map { i =>
      var acc = BigInt(0)
      var j = 0
      while (j < d) { acc += gram(i * d + j) * v(j); j += 1 }
      acc * v(i)
    }.sum
    val u = v.map(vi => alpha * vi / beta)
    IndexedSeq.tabulate(d * d) { idx =>
      val (i, j) = (idx / d, idx % d)
      gram(idx) - u(i) * v(j) / beta
    }
  }

  /** Top-r principal directions (r ≤ 4) by repeated power iteration +
    * [[deflate]]: ONE Gram pass feeds every component — the d²-long
    * artifact already contains all the information, so the extra
    * components cost d²-bounded driver arithmetic only, nothing
    * distributed. r = 1 reduces to [[topComponent]] bit for bit
    * (ExtensionsSpec).
    */
  def topComponents(vecs: DataFrame, vecCol: String, d: Int, r: Int,
                    iterations: Int = 8, qScale: Long = 1024L)
      : Seq[Seq[Long]] =
    componentsOf(gramOf(vecs, vecCol, d, qScale), d, r, iterations)

  /** Driver half of [[topComponents]] — also the resume path: feed a
    * merged [[addGrams]] artifact.
    */
  def componentsOf(gram: Seq[Long], d: Int, r: Int, iterations: Int)
      : Seq[Seq[Long]] = {
    require(r >= 1 && r <= 4,
      "top-r deflation is for leading directions (r <= 4); past that " +
        "use a real eigensolver on the collected Gram")
    var g = gram.map(BigInt(_)).toIndexedSeq
    (1 to r).map { k =>
      val v = powerIterateBig(g, d, iterations)
      if (k < r) g = deflate(g, v, d)
      v
    }
  }

  /** The corpus Gram matrix (row-major d×d longs) — PCA's RESUMABLE
    * ARTIFACT: integer outer-product sums are exactly additive, so
    * Gram(A ∪ B) = [[addGrams]](Gram(A), Gram(B)) bit-for-bit, and a
    * nightly pipeline persists the d² longs and folds each new batch
    * in without ever re-reading history — the same warm-start
    * contract as the rank vectors and label states, with the
    * stronger property that the incremental result is EXACTLY the
    * from-scratch result (sums commute; no iteration-budget split
    * subtlety at all).
    */
  def gramOf(vecs: DataFrame, vecCol: String, d: Int,
             qScale: Long = 1024L): Seq[Long] =
    vecs
      .select(quantize(col(vecCol), qScale).as("qv"))
      .agg(udaf(new GramAgg(d), ExpressionEncoder[Seq[Long]]())
        .apply(col("qv")).as("g"))
      .collect().head.getSeq[Long](0)

  /** Exact artifact merge — overflow raises like the aggregate. */
  def addGrams(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
    require(a.length == b.length, "gram dims differ")
    a.zip(b).map { case (x, y) => Math.addExact(x, y) }
  }

  /** The corpus's fixed-point top component: one Gram aggregate pass
    * + driver-side iteration.
    */
  def topComponent(vecs: DataFrame, vecCol: String, d: Int,
                   iterations: Int = 8, qScale: Long = 1024L)
      : Seq[Long] =
    powerIterate(gramOf(vecs, vecCol, d, qScale), d, iterations)

  /** Per-vector projection onto the top component: (id, proj), proj =
    * Σ q_i·v_i — the component travels as a broadcast array literal,
    * the dot product is codegen'd zip_with/aggregate, map-side only.
    */
  def project(vecs: DataFrame, idCol: String, vecCol: String, d: Int,
              iterations: Int = 8, qScale: Long = 1024L): DataFrame =
    projectWith(vecs, idCol, vecCol,
      topComponent(vecs, vecCol, d, iterations, qScale), qScale)

  /** [[project]] with a caller-supplied component (e.g. from a merged
    * Gram artifact). The overflow contract matches the Gram path's
    * loud-failure stance: each quantized element is guarded to
    * |q| < 2³⁷ inside the zip (|q·v| < 2³⁷·Scale = 2⁵⁷, and the d-term
    * sum stays under 2⁶³ for d ≤ 64), so an oversized qScale raises
    * instead of letting the non-ANSI Long dot product wrap silently.
    */
  def projectWith(vecs: DataFrame, idCol: String, vecCol: String,
                  component: Seq[Long], qScale: Long = 1024L)
      : DataFrame =
    projectManyWith(vecs, idCol, vecCol, Seq("proj" -> component), qScale)

  /** N projections in ONE map-side select — the top-r companion: each
    * named component becomes its own guarded dot-product column, so a
    * 2-D (or 4-D) projection never pays a join of per-component
    * frames (one pass over the corpus, still broadcast-literal
    * codegen).
    */
  def projectManyWith(vecs: DataFrame, idCol: String, vecCol: String,
                      components: Seq[(String, Seq[Long])],
                      qScale: Long = 1024L): DataFrame = {
    require(components.nonEmpty, "need at least one component")
    val qBound = 1L << 37
    val cols = components.map { case (name, component) =>
      require(component.length <= 64,
        "projection guard assumes d <= 64 (widen the q bound to go past)")
      require(component.forall(c => math.abs(c) <= Scale),
        "component must be renormed (|v_i| <= Scale)")
      val vLit = array(component.map(lit): _*)
      // dimension guard: zip_with pads the SHORTER side with nulls,
      // and a null term slides through the overflow when/otherwise
      // into a silently-null proj — the opposite of this module's
      // loud-failure contract (gramOf rejects wrong dims with
      // require). Reject the row up front instead. A NULL vector must
      // trip the same guard explicitly: size(null) is null, so the
      // =!= predicate alone is null → falls to otherwise → silently
      // null proj, the exact failure the guard exists to prevent.
      val dim = component.length
      when(col(vecCol).isNull || size(col(vecCol)) =!= dim,
          raise_error(concat(
            lit(s"projectWith: row vector length != component length $dim (got "),
            coalesce(size(col(vecCol)).cast("string"), lit("null")),
            lit(")"))))
        .otherwise(
          aggregate(zip_with(quantize(col(vecCol), qScale), vLit,
            (a, b) => when(abs(a) >= qBound,
                raise_error(concat(lit("projection term overflow: |q| >= " +
                  "2^37 (lower qScale); got "), a.cast("string"))))
              .otherwise(a * b)),
            lit(0L), (acc, x) => acc + x)).as(name)
    }
    vecs.select(col(idCol) +: cols: _*)
  }
}
