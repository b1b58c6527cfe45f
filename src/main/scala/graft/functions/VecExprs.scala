package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for dense-vector math (embedding similarity).
  *
  * Why custom expressions (same seam as [[HashExprs]]): the higher-order-
  * function formulation of a hyperplane sketch builds one
  * `aggregate(zip_with(v, lit(plane)))` subtree PER PLANE — at 8 bands x 16
  * bits x 64 dims that is a ~16,000-node expression whose Catalyst analysis
  * and codegen dominate the query (measured: more bits made the whole query
  * SLOWER on a 2,000-vector corpus, purely from plan-compile time). A single
  * expression holding the plane/centroid matrix runs the whole matrix-vector
  * loop in one compiled method: the tree is one node, analysis is O(1), and
  * eval touches each vector element once per plane.
  *
  * Null semantics: any null element inside an input array nulls the result
  * (mirrors `aggregate(zip_with(...))`, where a null product nulls the sum).
  */
object VecExprs {

  private def requireDoubleArray(name: String, dt: DataType): TypeCheckResult =
    dt match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<double>, got $other")
    }

  /** Reads an array<double> into a primitive array; null if any element null. */
  private def toVec(arr: ArrayData): Array[Double] = {
    val n = arr.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      out(i) = arr.getDouble(i)
      i += 1
    }
    out
  }

  /** Cosine similarity of two array<double> columns: dot / (|a| * |b|), IEEE
    * double semantics with the same left-to-right accumulation order as the
    * aggregate/zip_with form — bit-identical to it except for zero-norm
    * inputs, which return NULL instead of NaN (see compute).
    */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult =
      (requireDoubleArray(prettyName, left.dataType),
        requireDoubleArray(prettyName, right.dataType)) match {
        case (TypeCheckResult.TypeCheckSuccess, r) => r
        case (l, _) => l
      }
    override def prettyName: String = "cosine_sim"
    override def nullable: Boolean = true

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = toVec(l.asInstanceOf[ArrayData])
      val b = toVec(r.asInstanceOf[ArrayData])
      // zip_with pads the shorter side with null, which nulls the whole sum
      if (a == null || b == null || a.length != b.length) return null
      val n = a.length
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) { dot += a(i) * b(i); i += 1 }
      i = 0
      while (i < n) { na += a(i) * a(i); i += 1 }
      i = 0
      while (i < n) { nb += b(i) * b(i); i += 1 }
      // zero-norm vectors have no direction: NULL. (The HOF formulation —
      // and IEEE — yield 0.0/0.0 = NaN here, which is poison downstream:
      // Spark ORDERS NaN above every double, so a zero vector would
      // outrank true neighbors in top-k and pass `sim >= t` filters.
      // The deliberate deviation from bit-parity.)
      if (na == 0.0 || nb == 0.0) return null
      dot / (math.sqrt(na) * math.sqrt(nb))
    }

    // fully inline: the per-row work is small (3 short loops), so a
    // reference-object call + boxed Double per row is measurable overhead
    // in the brute-force paths; the generated loops keep identical
    // accumulation order to nullSafeEval.
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val ok = ctx.freshName("ok")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val x = ctx.freshName("x")
        s"""
           |final int $n = $a.numElements();
           |boolean $ok = $n == $b.numElements();
           |double $dot = 0.0, $na = 0.0, $nb = 0.0;
           |if ($ok) {
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $ok = false; break; }
           |  }
           |}
           |if ($ok) {
           |  for (int $i = 0; $i < $n; $i++) {
           |    $dot += $a.getDouble($i) * $b.getDouble($i);
           |  }
           |  for (int $i = 0; $i < $n; $i++) {
           |    final double $x = $a.getDouble($i); $na += $x * $x;
           |  }
           |  for (int $i = 0; $i < $n; $i++) {
           |    final double $x = $b.getDouble($i); $nb += $x * $x;
           |  }
           |}
           |if (!$ok || $na == 0.0 || $nb == 0.0) { ${ev.isNull} = true; }
           |else { ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)); }
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): CosineSim =
      copy(left = newLeft, right = newRight)
  }

  /** Banded random-hyperplane LSH keys of an array<double> vector:
    * output(b) = Σ_{j < bitsPerBand} (v · plane_{b*bitsPerBand+j} > 0 ? 1L << j : 0)
    * for b in [0, bands). Plane components derive deterministically from
    * (seed, global index) via the PORTABLE polynomial char digest
    * (HashExprs.polyDigest of "hp|seed|g", centered on 0) — identical on
    * every executor AND exactly replicable in DuckDB SQL, which is what
    * lets the q28 ANN query carry a hard oracle. Centered-uniform
    * components instead of Gaussians: sign-LSH only needs a symmetric
    * component distribution (the 64-term dot is near-Gaussian by CLT
    * either way); measured recall on the spec corpora is unchanged.
    *
    * With bands = 1 this is the classic single-table sign bucket (bit i =
    * sign(v · plane_i) at weight 2^i). Vectors whose length differs from
    * `dim` key to NULL (dropped from banding) rather than hashing partial
    * dots into plausible-looking buckets.
    */
  case class HyperplaneBandKeys(
      child: Expression, dim: Int, bands: Int, bitsPerBand: Int, seed: Long)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      requireDoubleArray(prettyName, child.dataType)
    override def prettyName: String = "hyperplane_band_keys"
    override def nullable: Boolean = true

    // row-major (plane, dim) matrix: component g is the centered portable
    // digest of "hp|seed|g" — (p-1)/2 = 1073741823 subtracted so the
    // distribution is symmetric about 0 (a sign projection needs only
    // symmetry). SQL replica: fold unicode() over the same string.
    @transient private lazy val planes: Array[Double] = {
      Array.tabulate(bands * bitsPerBand * dim) { g =>
        val s = org.apache.spark.unsafe.types.UTF8String.fromString(
          "hp|" + seed + "|" + g)
        (HashExprs.polyDigest(s, 257L) - 1073741823L).toDouble
      }
    }

    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[ArrayData])

    def compute(arr: ArrayData): ArrayData = {
      val v = toVec(arr)
      // a wrong-dimension vector (schema drift, truncated ingest) must not
      // silently hash with partial dots into plausible-looking buckets:
      // NULL drops it from banding (posexplode skips the row) and surfaces
      // the bad data, instead of giving it garbage locality
      if (v == null || v.length != dim) return null
      val d = dim
      val keys = new Array[Long](bands)
      var b = 0
      while (b < bands) {
        var key = 0L
        var j = 0
        while (j < bitsPerBand) {
          val base = ((b * bitsPerBand) + j) * dim
          var dot = 0.0
          var i = 0
          while (i < d) { dot += v(i) * planes(base + i); i += 1 }
          if (dot > 0) key |= (1L << j)
          j += 1
        }
        keys(b) = key
        b += 1
      }
      new GenericArrayData(keys)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj(
        "hyperplaneBandKeys", this, classOf[HyperplaneBandKeys].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"""
           |${ev.value} = $ref.compute($c);
           |if (${ev.value} == null) { ${ev.isNull} = true; }
         """.stripMargin)
    }

    override protected def withNewChildInternal(newChild: Expression): HyperplaneBandKeys =
      copy(child = newChild)
  }

  /** The `nprobe` nearest centroids of an array<double> vector by squared
    * L2, as an array<int> of cell ids ordered by (distance, cell id) — ties
    * break toward the smaller cell, matching sort_array over (d, cell)
    * structs. nprobe = 1 is the IVF cell assignment itself.
    *
    * The trained centroid matrix rides in the expression (driver-trained,
    * tiny: nlist x dim doubles) — broadcast with the plan, one node in the
    * tree, no literal arrays for Catalyst to analyze.
    */
  case class NearestCentroids(
      child: Expression, centroids: Seq[Seq[Double]], nprobe: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      requireDoubleArray(prettyName, child.dataType)
    override def prettyName: String = "nearest_centroids"
    override def nullable: Boolean = true

    @transient private lazy val cents: Array[Array[Double]] =
      centroids.map(_.toArray).toArray
    private val k = math.min(nprobe, centroids.size)

    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[ArrayData])

    def compute(arr: ArrayData): ArrayData = {
      val v = toVec(arr)
      // dimension drift gets NULL (dropped from cell assignment), not a
      // partial-distance garbage cell — same policy as HyperplaneBandKeys
      if (v == null || cents.length == 0 || v.length != cents(0).length)
        return null
      val nlist = cents.length
      val d2 = new Array[Double](nlist)
      var c = 0
      while (c < nlist) {
        val cent = cents(c)
        var s = 0.0
        var i = 0
        while (i < v.length) { val d = v(i) - cent(i); s += d * d; i += 1 }
        d2(c) = s
        c += 1
      }
      // selection of the k smallest by (dist, id): k and nlist are tiny
      // (<= dozens), a simple partial selection sort is optimal here
      val idx = Array.tabulate(nlist)(identity)
      var out = 0
      while (out < k) {
        var best = out
        var j = out + 1
        while (j < nlist) {
          val a = idx(j); val b = idx(best)
          if (d2(a) < d2(b) || (d2(a) == d2(b) && a < b)) best = j
          j += 1
        }
        val t = idx(out); idx(out) = idx(best); idx(best) = t
        out += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(idx, k).map(i => i: Any))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj(
        "nearestCentroids", this, classOf[NearestCentroids].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"""
           |${ev.value} = $ref.compute($c);
           |if (${ev.value} == null) { ${ev.isNull} = true; }
         """.stripMargin)
    }

    override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
      copy(child = newChild)
  }

  // Column-level API

  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def hyperplaneBandKeys(
      vec: Column, dim: Int, bands: Int, bitsPerBand: Int, seed: Long): Column =
    ColumnBridge.column(HyperplaneBandKeys(
      ColumnBridge.expression(vec), dim, bands, bitsPerBand, seed))

  def nearestCentroids(vec: Column, centroids: Seq[Seq[Double]], nprobe: Int): Column =
    ColumnBridge.column(NearestCentroids(
      ColumnBridge.expression(vec), centroids, nprobe))
}
