package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** N-ary UNION with cross-leg type normalization.
  *
  * The reference's TupleUnion normalizes column types across union legs
  * before dedup (reference: dbcon/joblist/tupleunion.h:96 `normalize`,
  * tupleunion.cpp — int/decimal/float/string promotion). Spark's DataFrame
  * `union` requires identical schemas, so we reimplement the promotion
  * lattice: by-position, each output column gets the least common promoted
  * type of the legs' columns; column names come from the first leg.
  */
object UnionNormalize {

  private def isIntegral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** int ⊔ decimal ⊔ double ⊔ string promotion (null ⊔ t = t). */
  def promote(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (NullType, t) => t
    case (t, NullType) => t
    case (s: StringType, _) => s
    case (_, s: StringType) => s
    case (DoubleType, _: NumericType) | (_: NumericType, DoubleType) => DoubleType
    case (FloatType, _: NumericType) | (_: NumericType, FloatType) => DoubleType
    case (d1: DecimalType, d2: DecimalType) =>
      val scale = math.max(d1.scale, d2.scale)
      val intDigits = math.max(d1.precision - d1.scale, d2.precision - d2.scale)
      DecimalType(math.min(intDigits + scale, DecimalType.MAX_PRECISION), scale)
    case (d: DecimalType, i) if isIntegral(i) => promoteIntDec(d)
    case (i, d: DecimalType) if isIntegral(i) => promoteIntDec(d)
    case (x, y) if isIntegral(x) && isIntegral(y) => LongType
    case (DateType, TimestampType) | (TimestampType, DateType) => TimestampType
    case _ => StringType
  }

  private def promoteIntDec(d: DecimalType): DataType = {
    val intDigits = math.max(20, d.precision - d.scale)
    DecimalType(math.min(intDigits + d.scale, DecimalType.MAX_PRECISION), d.scale)
  }

  /** UNION ALL with normalization; pass distinct=true for UNION. */
  def unionNormalized(legs: Seq[DataFrame], distinct: Boolean = false): DataFrame = {
    require(legs.nonEmpty, "union of zero legs")
    val arity = legs.head.schema.length
    require(legs.forall(_.schema.length == arity),
      s"union legs must have equal arity (${legs.map(_.schema.length)})")
    val outTypes = legs.map(_.schema.fields.map(_.dataType))
      .reduce((x, y) => x.zip(y).map { case (a, b) => promote(a, b) })
    val outNames = legs.head.schema.fieldNames
    val cast = legs.map { df =>
      df.select(df.schema.fieldNames.zipWithIndex.map { case (n, idx) =>
        col(n).cast(outTypes(idx)).as(outNames(idx))
      }.toIndexedSeq: _*)
    }
    val all = cast.reduce(_.union(_))
    if (distinct) all.distinct() else all
  }
}
