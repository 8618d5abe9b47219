package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Vector kernels for the similarity-search operators (extension — the
  * reference has no vector/array machinery; SURVEY §4 extension list).
  *
  * Native Catalyst expressions (not UDFs): inputs stay as ArrayData — no
  * per-row boxing into Scala Seq — and evaluation happens inside
  * whole-stage codegen via a static kernel, so a brute-force scan over
  * billions of embeddings is a tight vectorizable loop per row.
  */
object VectorKernels {
  private def checkDims(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    // silently truncating to min(len) would turn corrupt embeddings into
    // plausible-but-wrong similarity scores — fail loudly instead
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"vector dimension mismatch: $n vs ${b.numElements()}")
    n
  }

  /** dot(a,b) over float arrays, accumulated in double. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = checkDims(a, b)
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def norm(a: ArrayData): Double = {
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val v = a.getFloat(i).toDouble; s += v * v; i += 1 }
    math.sqrt(s)
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    if (na == 0.0 || nb == 0.0) 0.0 else d / (na * nb)
  }

  def l2(a: ArrayData, b: ArrayData): Double = {
    val n = checkDims(a, b)
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      s += d * d; i += 1
    }
    math.sqrt(s)
  }

  /** Deterministic pseudo-random plane weights, memoized per
    * (planes, seed, dims) — recomputing the FNV-derived weights per ROW
    * would dominate the kernel at scale; the cache makes the per-row cost
    * a pure dims×planes dot product. */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long, Int), Array[Double]]()

  def planeWeights(planes: Int, seed: Long, dims: Int): Array[Double] =
    planeCache.computeIfAbsent((planes, seed, dims), { key =>
      val (p0, s0, n0) = key
      val w = new Array[Double](p0 * n0)
      var p = 0
      while (p < p0) {
        var i = 0
        while (i < n0) {
          // deterministic pseudo-uniform weight in [-1,1) from FNV of (p,i).
          // The murmur finalizer is LOAD-BEARING: raw FNV over these four
          // low-entropy bytes has no avalanche — each weight decomposes into
          // a per-plane constant plus a term depending only on the low bits
          // of i, which made plane SIGNS repeat with period 8 and collapsed
          // 2^16 buckets into a handful (caught by the non-adjacent
          // planted-dup recall test).
          val h = Fnv64.mix(Fnv64.hashBytes(Array(
            (p & 0xff).toByte, ((p >> 8) & 0xff).toByte,
            (i & 0xff).toByte, ((i >> 8) & 0xff).toByte), s0))
          w(p * n0 + i) = h.toDouble / Long.MaxValue.toDouble
          i += 1
        }
        p += 1
      }
      w
    })

  /** Spark SQL's double comparison (codegen genComp for DoubleType):
    * NaN compares greater than everything and equal to itself, ±0.0 are
    * equal. Reproduced here so the argmax/argmin kernels below decide
    * ties and NaN scores EXACTLY like the `if(a >= b, …)` /
    * `if(a < b, …)` SQL folds they replace. */
  private def nanSafeCompare(x: Double, y: Double): Int =
    if (x < y) -1
    else if (x > y) 1
    else if (java.lang.Double.isNaN(x)) { if (java.lang.Double.isNaN(y)) 0 else 1 }
    else if (java.lang.Double.isNaN(y)) -1
    else 0

  /** argmax-cosine over a cid-sorted array<struct<cid:int,
    * centroid:array<float>>> — the codegen'd replacement for the
    * interpreted aggregate/transform/zip_with fold in the IVF Lloyd
    * reassign (same accumulation order: dot, normA, normB each a
    * sequential fold over i = 0..n-1; `>=` keeps the LAST maximum while
    * scanning ascending cid, so ties land on the larger cid — and the
    * comparison is Spark-nan-safe like the SQL fold's). Bit-identical
    * results, ~20× less per-row cost than the interpreted lambdas. */
  def argmaxCosine(emb: ArrayData, carr: ArrayData): Int = {
    val nc = carr.numElements()
    val n = emb.numElements()
    var na = 0.0
    var i = 0
    while (i < n) { val v = emb.getFloat(i).toDouble; na += v * v; i += 1 }
    val sna = math.sqrt(na)
    var bestC = -2.0
    var bestId = -1
    var c = 0
    while (c < nc) {
      val s = carr.getStruct(c, 2)
      val cid = s.getInt(0)
      val cen = s.getArray(1)
      if (cen.numElements() != n)
        throw new IllegalArgumentException(
          s"centroid dimension mismatch: $n vs ${cen.numElements()}")
      var d = 0.0
      var nb = 0.0
      var j = 0
      while (j < n) {
        val x = emb.getFloat(j).toDouble
        val y = cen.getFloat(j).toDouble
        d += x * y; nb += y * y; j += 1
      }
      val ccos = d / (sna * math.sqrt(nb))
      if (nanSafeCompare(ccos, bestC) >= 0) { bestC = ccos; bestId = cid }
      c += 1
    }
    bestId
  }

  /** Best cosine over the same cid-sorted centroid array as
    * argmaxCosine — the VALUE the argmax fold tracks, for callers that
    * need both (x_ann_ood_detection's quarantine threshold). Identical
    * loop, accumulation order, init (−2.0) and nan-safe compare, so
    * (argmaxCosine, maxCosine) decompose the interpreted
    * struct-fold `aggregate(transform(carr, …), struct(-2.0, -1),
    * (best, s) -> if(s.ccos >= best.ccos, s, best))` bit-exactly. */
  def maxCosine(emb: ArrayData, carr: ArrayData): Double = {
    val nc = carr.numElements()
    val n = emb.numElements()
    var na = 0.0
    var i = 0
    while (i < n) { val v = emb.getFloat(i).toDouble; na += v * v; i += 1 }
    val sna = math.sqrt(na)
    var bestC = -2.0
    var c = 0
    while (c < nc) {
      val s = carr.getStruct(c, 2)
      val cen = s.getArray(1)
      if (cen.numElements() != n)
        throw new IllegalArgumentException(
          s"centroid dimension mismatch: $n vs ${cen.numElements()}")
      var d = 0.0
      var nb = 0.0
      var j = 0
      while (j < n) {
        val x = emb.getFloat(j).toDouble
        val y = cen.getFloat(j).toDouble
        d += x * y; nb += y * y; j += 1
      }
      val ccos = d / (sna * math.sqrt(nb))
      if (nanSafeCompare(ccos, bestC) >= 0) bestC = ccos
      c += 1
    }
    bestC
  }

  /** argmin squared-L2 over a cid-sorted array<struct<cid:int,
    * cen:array<float>>> for a DOUBLE subvector — the codegen'd
    * replacement for the interpreted PQ encode fold (strict `<` keeps
    * the FIRST minimum while scanning ascending cid → ties to the
    * smaller cid; Infinity init; Spark-nan-safe compare — all exactly
    * the SQL fold's rules). */
  def argminL2(svec: ArrayData, cbook: ArrayData): Int = {
    val nc = cbook.numElements()
    val n = svec.numElements()
    var bestD = Double.PositiveInfinity
    var bestId = -1
    var c = 0
    while (c < nc) {
      val s = cbook.getStruct(c, 2)
      val cid = s.getInt(0)
      val cen = s.getArray(1)
      if (cen.numElements() != n)
        throw new IllegalArgumentException(
          s"codebook dimension mismatch: $n vs ${cen.numElements()}")
      var dd = 0.0
      var j = 0
      while (j < n) {
        val d = svec.getDouble(j) - cen.getFloat(j).toDouble
        dd += d * d; j += 1
      }
      if (nanSafeCompare(dd, bestD) < 0) { bestD = dd; bestId = cid }
      c += 1
    }
    bestId
  }

  /** L2-normalize: array<float> → array<double> — the codegen'd
    * replacement for the interpreted
    * `transform(embedding, x -> double(x) / sqrt(aggregate(embedding,
    * 0D, (acc, v) -> acc + double(v) * double(v))))` pair (r16: the
    * normalize+slice stage fed every PQ/residual/SQ8 chain through
    * interpreted lambdas — measured 0.66 s single-task at sf0.1).
    * Accumulation order is the SQL fold's exactly: acc starts 0.0 and
    * adds v·v in ascending element order, then each element divides by
    * the same sqrt — bit-identical results (oracle hash gate green
    * across the ANN suite). Null elements reproduce the SQL chain too:
    * one null element nulls the aggregate → nrm null → EVERY output
    * element null (an array of nulls, not a null array). */
  def normalizeL2(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var i = 0
    var anyNull = false
    while (i < n && !anyNull) { anyNull = a.isNullAt(i); i += 1 }
    if (anyNull)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[Any](n))
    var s = 0.0
    i = 0
    while (i < n) { val v = a.getFloat(i).toDouble; s += v * v; i += 1 }
    val nrm = math.sqrt(s)
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = a.getFloat(i).toDouble / nrm; i += 1 }
    ArrayData.toArrayData(out)
  }

  /** Ordered-fold squared L2 over two double arrays — the codegen'd
    * replacement for the interpreted
    * `aggregate(zip_with(a, b, (x, y) -> (x-y)²), 0D, +)` chain (the
    * SQ8 scoring pass runs it per (query, vector) pair). Same
    * accumulation order: (a[i]−b[i])² added in ascending i. The float
    * variants widen through double exactly like the SQL `double(x)`
    * casts. A null element nulls the SQL aggregate; the expression's
    * nullSafeEval mirrors that by returning null (boxed) from here. */
  def l2sqDD(a: ArrayData, b: ArrayData): Any = {
    val n = checkDims(a, b)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      i += 1
    }
    var s = 0.0
    i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      s += d * d; i += 1
    }
    s
  }

  /** l2sq for (array<double>, array<float>) — the PQ distance-table
    * shape (query subvector vs float-rounded codebook centroid). */
  def l2sqDF(a: ArrayData, b: ArrayData): Any = {
    val n = checkDims(a, b)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      i += 1
    }
    var s = 0.0
    i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getFloat(i).toDouble
      s += d * d; i += 1
    }
    s
  }

  /** Element-wise subtract over two double arrays — the codegen'd
    * replacement for the interpreted `zip_with(a, b, (x, y) -> x - y)`
    * (the residual-PQ encode input, per corpus row). Null elements
    * reproduce zip_with: a null on either side yields a null element
    * at that position. */
  def vecSub(a: ArrayData, b: ArrayData): ArrayData = {
    val n = checkDims(a, b)
    var i = 0
    var anyNull = false
    while (i < n && !anyNull) {
      anyNull = a.isNullAt(i) || b.isNullAt(i); i += 1
    }
    if (!anyNull) {
      val out = new Array[Double](n)
      i = 0
      while (i < n) { out(i) = a.getDouble(i) - b.getDouble(i); i += 1 }
      ArrayData.toArrayData(out)
    } else {
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        out(i) =
          if (a.isNullAt(i) || b.isNullAt(i)) null
          else java.lang.Double.valueOf(a.getDouble(i) - b.getDouble(i))
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  /** Random-hyperplane LSH bucket: sign bit per plane, planes derived
    * deterministically from (planeIdx, dimIdx) hashes — no stored model. */
  def lshBucket(a: ArrayData, planes: Int, seed: Long): Int = {
    val n = a.numElements()
    val w = planeWeights(planes, seed, n)
    var bucket = 0
    var p = 0
    while (p < planes) {
      var s = 0.0
      var i = 0
      val base = p * n
      while (i < n) {
        s += a.getFloat(i).toDouble * w(base + i)
        i += 1
      }
      if (s > 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }
}

abstract class BinaryVectorExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  protected def kernel: String
  protected def kernelFn: (ArrayData, ArrayData) => Double

  // the kernels read elements with getFloat: anything but array<float>
  // would silently produce garbage under codegen, so reject it at analysis
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = ArrayType(FloatType)
    if (Seq(left, right).forall(e =>
      e.dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      }))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two $ok arguments, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  protected override def nullSafeEval(a: Any, b: Any): Any =
    kernelFn(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernels.$kernel($a, $b)")
}

/** COSINE_SIM(a, b) → double in [-1, 1]. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryVectorExpression {
  override def prettyName: String = "cosine_sim"
  protected def kernel = "cosine"
  protected def kernelFn = VectorKernels.cosine
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** DOT_PRODUCT(a, b) → double. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryVectorExpression {
  override def prettyName: String = "dot_product"
  protected def kernel = "dot"
  protected def kernelFn = VectorKernels.dot
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** L2_DISTANCE(a, b) → double. */
case class L2Distance(left: Expression, right: Expression)
    extends BinaryVectorExpression {
  override def prettyName: String = "l2_distance"
  protected def kernel = "l2"
  protected def kernelFn = VectorKernels.l2
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** LSH_BUCKET(vec): random-hyperplane bucket id in [0, 2^planes). */
case class LshBucket(child: Expression, planes: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "lsh_bucket"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float>, got ${other.simpleString}")
    }

  protected override def nullSafeEval(input: Any): Any =
    VectorKernels.lshBucket(input.asInstanceOf[ArrayData], planes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.lshBucket($c, $planes, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

/** ARGMAX_COSINE(emb, carr) → int cid (see VectorKernels.argmaxCosine). */
case class ArgMaxCosine(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "argmax_cosine"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _),
            ArrayType(StructType(Array(f1, f2)), _))
          if f1.dataType == IntegerType &&
            f2.dataType.isInstanceOf[ArrayType] &&
            f2.dataType.asInstanceOf[ArrayType].elementType == FloatType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<float>, array<struct<int," +
            s"array<float>>>), got (${l.simpleString}, ${r.simpleString})")
    }

  protected override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.argmaxCosine(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernels.argmaxCosine($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** MAX_COSINE(emb, carr) → double best cosine (see
  * VectorKernels.maxCosine). */
case class MaxCosine(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "max_cosine"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _),
            ArrayType(StructType(Array(f1, f2)), _))
          if f1.dataType == IntegerType &&
            f2.dataType.isInstanceOf[ArrayType] &&
            f2.dataType.asInstanceOf[ArrayType].elementType == FloatType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<float>, array<struct<int," +
            s"array<float>>>), got (${l.simpleString}, ${r.simpleString})")
    }

  protected override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.maxCosine(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernels.maxCosine($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** ARGMIN_L2(svec, cbook) → int cid (see VectorKernels.argminL2). */
case class ArgMinL2(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "argmin_l2"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _),
            ArrayType(StructType(Array(f1, f2)), _))
          if f1.dataType == IntegerType &&
            f2.dataType.isInstanceOf[ArrayType] &&
            f2.dataType.asInstanceOf[ArrayType].elementType == FloatType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<double>, array<struct<int," +
            s"array<float>>>), got (${l.simpleString}, ${r.simpleString})")
    }

  protected override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.argminL2(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernels.argminL2($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** NORMALIZE_L2(emb): array<float> → array<double> (see
  * VectorKernels.normalizeL2 for the bit-exactness contract). */
case class NormalizeL2(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "normalize_l2"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float>, got ${other.simpleString}")
    }

  protected override def nullSafeEval(input: Any): Any =
    VectorKernels.normalizeL2(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.normalizeL2($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeL2 =
    copy(child = newChild)
}

/** L2_SQ(a, b) → double: ordered-fold squared L2; accepts
  * (array<double>, array<double>) and (array<double>, array<float>) —
  * the two shapes the interpreted l2sq fold was used with. Nullable:
  * a null element on either side nulls the result, like the SQL
  * aggregate it replaces. */
case class L2Sq(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "l2_sq"

  private def rightIsFloat: Boolean = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) |
           (ArrayType(DoubleType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<double>, array<double|float>), " +
            s"got (${l.simpleString}, ${r.simpleString})")
    }

  protected override def nullSafeEval(a: Any, b: Any): Any =
    if (rightIsFloat)
      VectorKernels.l2sqDF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      VectorKernels.l2sqDD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = if (rightIsFloat) "l2sqDF" else "l2sqDD"
    // the kernel returns a boxed Double or null (null-element semantics),
    // so nullSafeCodeGen with an explicit unbox + isNull update
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("boxed")
      s"""
         |Object $boxed = graft.functions.VectorKernels.$kernel($a, $b);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Double) $boxed).doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** VEC_SUB(a, b): element-wise a − b over array<double> (see
  * VectorKernels.vecSub). */
case class VecSub(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "vec_sub"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<double> arguments, got " +
            s"(${l.simpleString}, ${r.simpleString})")
    }

  protected override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.vecSub(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernels.vecSub($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object VectorFunctions {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
  def cosineSim(a: Column, b: Column): Column =
    column(CosineSim(expression(a), expression(b)))
  def dotProduct(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))
  def l2Distance(a: Column, b: Column): Column =
    column(L2Distance(expression(a), expression(b)))
  def lshBucket(v: Column, planes: Int = 8, seed: Long = 42L): Column =
    column(LshBucket(expression(v), planes, seed))
  def argmaxCosine(emb: Column, carr: Column): Column =
    column(ArgMaxCosine(expression(emb), expression(carr)))
  def maxCosine(emb: Column, carr: Column): Column =
    column(MaxCosine(expression(emb), expression(carr)))
  def argminL2(svec: Column, cbook: Column): Column =
    column(ArgMinL2(expression(svec), expression(cbook)))
  def normalizeL2(v: Column): Column =
    column(NormalizeL2(expression(v)))
  def l2Sq(a: Column, b: Column): Column =
    column(L2Sq(expression(a), expression(b)))
  def vecSub(a: Column, b: Column): Column =
    column(VecSub(expression(a), expression(b)))
}
