package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `array<float|double>` embeddings.
  *
  * Pure `functions._` compositions (zip_with / aggregate) — codegen'd,
  * no UDFs, so the hot path stays inside whole-stage codegen and scales
  * linearly with rows on any cluster size. Sums run sequentially
  * left-to-right in double precision, which keeps results bit-identical
  * to a single-threaded oracle evaluating the same expression.
  */
object Vectors {
  /** elementwise product-sum in double precision (expression form).
    * NOTE: Catalyst higher-order functions are CodegenFallback —
    * interpreted per element. Fine for O(n) per-vector passes; for O(n²)
    * pair loops use [[dotFast]]. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Same math as [[dot]] — left-to-right double product-sum, so results
    * are bit-identical — but as a native codegen'd Catalyst expression
    * ([[graft.functions.FloatDot]]): reads ArrayData in place inside the
    * generated loop, no per-row array copy, fused into WholeStageCodegen.
    * (Was a Scala UDF: measurably faster than interpreted higher-order
    * lambdas, but still paid conversion + a black-box call per pair.) */
  def dotFast(a: Column, b: Column): Column =
    graft.functions.NativeVector.floatDot(a, b)

  /** squared L2 distance, float vector vs double vector (IVF centroids) */
  def dist2FD(a: Column, b: Column): Column =
    graft.functions.NativeVector.floatDoubleDist2(a, b)

  /** dot product, float vector vs double vector (residual PQ encoding) */
  def dotFD(a: Column, b: Column): Column =
    graft.functions.NativeVector.floatDoubleDot(a, b)

  def norm2(a: Column): Column = sqrt(dot(a, a))
  def norm2Fast(a: Column): Column = sqrt(dotFast(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm2(a) * norm2(b))

  /** Symmetric int8 quantization of a float vector — the standard 4×
    * memory compression for embedding storage/ANN: per-vector scale
    * `127 / max|x|`, code `floor(x·scale + 0.5)` (explicit half-up —
    * `round()`'s half-even would still be portable, but floor+0.5 is
    * unambiguous across engines). Returns `struct(scale, codes)`;
    * dequantize as `code / scale`. All double arithmetic — the same
    * IEEE ops in any engine, so results are bit-reproducible. */
  def quantizeInt8(v: Column): Column = {
    val maxAbs = array_max(transform(v, x => abs(x.cast("double"))))
    val scale = when(maxAbs > 0.0, lit(127.0) / maxAbs).otherwise(lit(0.0))
    struct(scale.as("scale"),
      transform(v, x =>
        floor(x.cast("double") * scale + 0.5).cast("int")).as("codes"))
  }
  def cosineFast(a: Column, b: Column): Column =
    graft.functions.NativeVector.cosine(a, b)

  /** squared L2 distance */
  def dist2(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0), (acc, x) => acc + x)

  /** Smallest SRP plane count whose 2^planes buckets hold ~`target` rows
    * each at corpus size `n` — the knob that keeps per-bucket pairwise
    * work FLAT as the corpus grows (the r10 verdict's scale contract,
    * now code instead of prose). Integer-exact — bit length of
    * ceil(n/target)−1, no floating log — so an external oracle derives
    * the identical count (DuckDB: `length(bin(((n + target-1)//target)
    * - 1))`). Clamped to [lo, hi]; hi=20 keeps the 2^planes-row
    * centroid/bucket side tables broadcastable (≤1M rows). */
  def autoSrpPlanes(n: Long, target: Long = 256L,
      lo: Int = 4, hi: Int = 20): Int = {
    val m = (math.max(n, 1L) + target - 1) / target
    val bits =
      if (m <= 1) 0
      else 64 - java.lang.Long.numberOfLeadingZeros(m - 1)
    math.min(hi, math.max(lo, bits))
  }

  /** Deterministic pseudo-random hyperplane: component j of plane p is
    * a signed hash of (p, j) — reproducible on any cluster, no RNG state. */
  private def planeComponent(p: Int, j: Column): Column =
    when(pmod(xxhash64(lit(p), j), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))

  /** Sign-random-projection (SimHash-for-vectors) bucket id over `nPlanes`
    * deterministic hyperplanes: the LSH key for cosine similarity. Vectors
    * with high cosine land in equal buckets with high probability. */
  def srpBucket(vec: Column, nPlanes: Int): Column =
    srpBucketImpl(vec, nPlanes, planeComponent)

  /** PORTABLE SRP bucket: plane component ±1 from the md5-prefix parity
    * of "p|j", so an external engine reproduces bucket assignment
    * bit-for-bit (DuckDB: `CASE WHEN CAST(('0x' || substr(md5(p || '|'
    * || j), 1, 15)) AS BIGINT) % 2 = 0 THEN 1.0 ELSE -1.0 END`).
    *
    * The components are plan-time CONSTANTS — computed once driver-side
    * with the same md5 construction and shipped as literal arrays, so
    * the per-row work is just the dot products (no hashing in the row
    * loop at all). `maxDim` bounds the precomputed tables; vectors
    * longer than it are rejected at plan time. */
  def srpBucketPortable(vec: Column, nPlanes: Int,
      maxDim: Int = 1024): Column = {
    val bits = (0 until nPlanes).map { p =>
      val comps = Array.tabulate(maxDim)(j => md5Parity(s"$p|$j"))
      val s = aggregate(
        zip_with(vec, slice(lit(comps), lit(1), size(vec)),
          (x, c) => x.cast("double") * c),
        lit(0.0), (acc, x) => acc + x)
      when(s >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Driver-side twin of the md5-prefix-60 parity sign (see
    * [[graft.operators.TextAnalysis.md5Prefix60]]): +1.0 when the first
    * 60 digest bits are even — byte-identical to the engine/oracle
    * construction, which is what keeps the literal plane tables
    * oracle-reproducible. */
  private def md5Parity(s: String): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    if (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2 == 0) 1.0
    else -1.0
  }

  private def srpBucketImpl(vec: Column, nPlanes: Int,
      component: (Int, Column) => Column): Column = {
    // bit p = sign(dot(vec, plane_p)); bucket = sum(bit_p << p)
    val bits = (0 until nPlanes).map { p =>
      val s = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, j) => x.cast("double") * component(p, j)),
        lit(0.0), (acc, x) => acc + x)
      when(s >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
