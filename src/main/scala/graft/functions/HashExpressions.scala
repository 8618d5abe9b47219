package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
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
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  protected override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SimHash64.eval(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHash64.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Static kernel shared by eval and generated code. */
  def eval(arr: ArrayData): Long = {
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
}

/** HAMMING64(a, b): bit distance between two 64-bit hashes. */
case class Hamming64(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming64"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Hamming64 =
    copy(left = newLeft, right = newRight)
}

/** FINGERPRINT64(str): Karp-Rabin polynomial rolling hash of a string —
  * document fingerprinting for the text-analysis suite (extension). */
case class Fingerprint64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint64"

  protected override def nullSafeEval(input: Any): Any =
    Fingerprint64.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fingerprint64.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
    copy(child = newChild)
}

object Fingerprint64 {
  final val Base = 1000003L
  def eval(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * Base + (bytes(i) & 0xffL); i += 1 }
    h
  }
}

/** MINHASH_SIG(tokens, k): array of k 64-bit min-hashes of a token set —
  * the signature feeding MinHash-LSH dedup. Hash family: FNV-1a with seed i.
  * Per-row map, codegen'd; banding/joining happens in plain DataFrame ops. */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  protected override def nullSafeEval(input: Any): Any =
    MinHashSig.eval(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.eval($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def eval(arr: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val bytes = arr.getUTF8String(i).getBytes
        var j = 0
        while (j < k) {
          val h = Fnv64.hashBytes(bytes, j * 0x9e3779b97f4a7c15L)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }
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
