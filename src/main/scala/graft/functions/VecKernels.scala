package graft.functions

/** JIT-compiled per-row vector kernels for the embedding family
  * (similarity search + embedding near-dup, SURVEY.md §2.J).
  *
  * Same rationale as [[TextKernels]]: a dot product / sign-LSH signature is
  * purely local per-row work, and Spark's higher-order functions
  * (`aggregate`/`zip_with`) evaluate the per-element lambda interpreted
  * (measured ~5× slower, NOTES.md) — so the hot path is a typed
  * `mapPartitions` over primitive arrays, map-only, zero shuffle.
  *
  * All accumulation is a sequential left-to-right double fold, bit-identical
  * to the column-expression formulation it replaces (and to DuckDB's
  * LIST_DOT_PRODUCT scan order), so oracle hash parity is unaffected.
  */
object VecKernels {

  def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  def cosine(a: Array[Float], b: Array[Float]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  /** Deterministic Gaussian hyperplanes, `planes(i)(d)`, seeded — every
    * executor derives the identical family without any broadcast. */
  def planes(nPlanes: Int, dim: Int, seed: Long = 7L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** v / ‖v‖₂ as doubles (spherical-k-means coordinates: cosine similarity
    * becomes a plain dot product). Zero vectors map to zeros. Power-of-two
    * scalings of v normalize bit-identically (the division is exact), which
    * is what makes the planted-clone oracle construction deterministic. */
  def normalize(v: Array[Float]): Array[Double] = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
    val n = math.sqrt(s)
    val out = new Array[Double](v.length)
    if (n > 0) { i = 0; while (i < v.length) { out(i) = v(i) / n; i += 1 } }
    out
  }

  /** [[cosine]] over Catalyst ArrayData — the JVM entry [[CosineSim]]'s
    * generated code calls (identical double fold, so SQL-surface scores
    * are bit-equal to the kernel/index path). */
  def cosineAD(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Double =
    cosine(a.toFloatArray(), b.toFloatArray())

  /** [[cosineAD]] with a PRE-HOISTED query side: the brute-force decline
    * path evaluates `graft_cosine(col, <literal>)` per row, and converting
    * the literal per row costs a dim-sized copy each time — [[CosineSim]]
    * hoists the foldable side once (codegen: a reference object; eval: a
    * transient lazy) and the row side reads straight off the ArrayData,
    * no copy at all. Accumulation order matches [[cosine]]'s three
    * independent folds exactly, so scores stay bit-equal. */
  def cosineADQ(a: org.apache.spark.sql.catalyst.util.ArrayData,
      q: Array[Float]): Double = {
    val na = a.numElements()
    val n = math.min(na, q.length)
    var sab = 0.0
    var i = 0
    while (i < n) { sab += a.getFloat(i).toDouble * q(i).toDouble; i += 1 }
    var saa = 0.0
    i = 0
    while (i < na) { val v = a.getFloat(i).toDouble; saa += v * v; i += 1 }
    var sqq = 0.0
    i = 0
    while (i < q.length) { val v = q(i).toDouble; sqq += v * v; i += 1 }
    sab / (math.sqrt(saa) * math.sqrt(sqq))
  }

  def dotD(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Index of the centroid with the highest dot product against `v`
    * (spherical k-means assignment). Ties break to the LOWEST index (strict
    * `>`), so bit-identical vectors always land in the same cluster. */
  def nearestCentroid(v: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val d = dotD(v, cents(c))
      if (d > bestDot) { bestDot = d; best = c }
      c += 1
    }
    best
  }

  /** Multi-band sign-LSH: bucket key of band `b` packs the sign bits of
    * planes [b*rowsPerBand, (b+1)*rowsPerBand). Independent bands trade one
    * 2^r bucketing for `bands` of them — collision probability for cosine
    * similarity s is 1-(1-p^r)^bands with p = 1-θ(s)/π, and bucket count per
    * band is 2^r, so r (not the corpus) sets the block size: at 100 TB raise
    * r to 20-24 and the within-bucket candidate join stays near-linear. */
  def bandBuckets(v: Array[Float], pl: Array[Array[Double]],
      bands: Int, rowsPerBand: Int): Array[Long] = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var j = 0
      while (j < rowsPerBand) {
        val p = pl(b * rowsPerBand + j)
        var s = 0.0
        var i = 0
        val n = math.min(v.length, p.length)
        while (i < n) { s += v(i).toDouble * p(i); i += 1 }
        if (s >= 0) key |= (1L << j)
        j += 1
      }
      out(b) = key
      b += 1
    }
    out
  }
}
