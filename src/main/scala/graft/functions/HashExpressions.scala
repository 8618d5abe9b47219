package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic 64-bit hashes used by the dedup/fingerprint operators.
  * FNV-1a — self-contained (no engine-internal hash APIs), stable across
  * JVMs/executors, and trivially codegen-able. */
object Fnv64 {
  final val Offset = 0xcbf29ce484222325L
  final val Prime = 0x100000001b3L

  def hashBytes(bytes: Array[Byte], seed: Long): Long = {
    var h = Offset ^ seed
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL); h *= Prime; i += 1
    }
    h
  }

  /** Murmur3 finalizer — full-avalanche mix. Seed-perturbed FNV alone is NOT
    * an independent family (the seed's contribution is nearly
    * length-determined, which correlates the argmins MinHash relies on);
    * mixing (base + seed·φ) gives effectively independent hash functions. */
  def mix(z0: Long): Long = {
    var z = z0
    z ^= (z >>> 33); z *= 0xff51afd7ed558ccdL
    z ^= (z >>> 33); z *= 0xc4ceb9fe1a85ec53L
    z ^= (z >>> 33)
    z
  }
}

/** Static kernels shared by interpreted eval and generated code. Kept in an
  * object with NO companion class: Scala then emits static forwarders that
  * Janino-generated code can call directly (a companion class whose instance
  * methods shadow the forwarder name would silently break codegen). */
object HashKernels {
  final val FpBase = 1000003L

  def simhash(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = Fnv64.hashBytes(arr.getUTF8String(i).getBytes, 0L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Karp-Rabin polynomial rolling hash. */
  def fingerprint(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * FpBase + (bytes(i) & 0xffL); i += 1 }
    h
  }

  /** k independent min-hashes of a token set (FNV base + mixed seeds). */
  def minhash(arr: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val base = Fnv64.hashBytes(arr.getUTF8String(i).getBytes, 0L)
        var j = 0
        while (j < k) {
          val h = Fnv64.mix(base + (j + 1) * 0x9e3779b97f4a7c15L)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** SIMHASH64(tokens): 64-bit SimHash over an array of string tokens.
  *
  * Extension operator (not in the reference — its dedup story is plain
  * GROUP BY; SURVEY §4 extension list). Per token: FNV-1a 64 hash; each of
  * the 64 bit positions votes +1/-1; the sign vector packs into a long.
  * Near-duplicate docs differ in few bits (compare with HAMMING64).
  *
  * Runs per-row inside whole-stage codegen — no shuffle, no state; at
  * 100 TB this is a pure map over the scan.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  protected override def nullSafeEval(input: Any): Any =
    HashKernels.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** HAMMING64(a, b): bit distance between two 64-bit hashes. */
case class Hamming64(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming64"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Number].longValue ^
      b.asInstanceOf[Number].longValue)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Hamming64 =
    copy(left = newLeft, right = newRight)
}

/** FINGERPRINT64(str): Karp-Rabin polynomial rolling hash of a string —
  * document fingerprinting for the text-analysis suite (extension). */
case class Fingerprint64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint64"

  protected override def nullSafeEval(input: Any): Any =
    HashKernels.fingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.fingerprint($c)")

  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
    copy(child = newChild)
}

/** MINHASH_SIG(tokens, k): array of k 64-bit min-hashes of a token set —
  * the signature feeding MinHash-LSH dedup. Per-row map, codegen'd;
  * banding/joining happens in plain DataFrame ops. */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  protected override def nullSafeEval(input: Any): Any =
    HashKernels.minhash(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.minhash($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Column-level API for the hash expressions. */
object HashFunctions {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
  def simhash64(tokens: Column): Column = column(SimHash64(expression(tokens)))
  def hamming64(a: Column, b: Column): Column =
    column(Hamming64(expression(a), expression(b)))
  def fingerprint64(s: Column): Column = column(Fingerprint64(expression(s)))
  def minhashSig(tokens: Column, k: Int): Column =
    column(MinHashSig(expression(tokens), k))
}
