package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** MySQL WEEK()/YEARWEEK() in all 8 modes.
  *
  * The reference registers week/yearweek with a mode argument
  * (reference: utils/funcexp/func_week.cpp:46, func_yearweek.cpp:133) and
  * computes them with calc_mysql_week
  * (utils/funcexp/funchelpers.h:226-345): mode bits are MONDAY_FIRST=1,
  * NO_ZERO=2, GT_THREE_DAYS=4, with monday-first modes flipping the GT3
  * bit (funchelpers.h:237-240 convert_mysql_mode_to_modeflags). The same
  * algorithm is reimplemented here as a static kernel over Spark's
  * internal date representation (days since epoch), evaluated inside
  * whole-stage codegen.
  */
object DateKernels {

  /** convert_mysql_mode_to_modeflags (funchelpers.h:237-240): monday-first
    * modes flip the GT_THREE_DAYS bit. */
  private def normalize(mode: Int): Int = {
    val m0 = mode & 7
    if ((m0 & 1) != 0) m0 ^ 4 else m0
  }

  /** Epoch day of the first day of year's week 1, memoized per
    * (year, flags) — the hot kernel runs per row, and recomputing the two
    * LocalDate objects per call would dominate it
    * (reference: funchelpers.h:276-296 baseday computation). */
  private val basedayCache =
    new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()

  private def baseday(year: Int, sundayFirst: Boolean, gt3: Boolean): Long =
    basedayCache.computeIfAbsent(
      (year << 2) | (if (sundayFirst) 2 else 0) | (if (gt3) 1 else 0),
      { _ =>
        // java.time: 1=Monday..7=Sunday → 0=Sunday..6=Saturday
        val dowSun =
          java.time.LocalDate.of(year, 1, 1).getDayOfWeek.getValue % 7
        val fw = if (sundayFirst) dowSun else (dowSun + 6) % 7
        var base = java.time.LocalDate.of(year, 1, 1).toEpochDay +
          (if (fw != 0) 7 - fw else 0)
        if (gt3 && fw > 0 && fw < 4) base -= 7
        java.lang.Long.valueOf(base)
      }).longValue()

  /** calc_mysql_week (funchelpers.h:253-345) over pre-normalized modeflags:
    * returns weekyear*1000+weeknum so week and yearweek share one kernel. */
  private def calcWeek(epochDay: Int, modeflags: Int): Int = {
    val sundayFirst = (modeflags & 1) == 0
    val gt3 = (modeflags & 4) != 0
    val noZero = (modeflags & 2) != 0
    val d = java.time.LocalDate.ofEpochDay(epochDay.toLong)
    val jd = epochDay.toLong
    val y = d.getYear
    val base = baseday(y, sundayFirst, gt3)
    if (jd < base && noZero) {
      // date falls before this year's week 1 → last week of previous year
      val wk = ((jd - baseday(y - 1, sundayFirst, gt3)) / 7 + 1).toInt
      (y - 1) * 1000 + wk
    } else {
      var weekyear = y
      var weeknum = if (jd >= base) ((jd - base) / 7 + 1).toInt else 0
      if (gt3 && noZero && weeknum > 52) {
        // December tail: the week is 1 of next year when >3 of its days
        // fall in next year (funchelpers.h:326-338)
        val daysThisYear = 32 - d.getDayOfMonth
        val dowSun = d.getDayOfWeek.getValue % 7
        val fwd = if (sundayFirst) dowSun else (dowSun + 6) % 7
        if (fwd + daysThisYear < 4) { weeknum = 1; weekyear = y + 1 }
      }
      weekyear * 1000 + weeknum
    }
  }

  def week(epochDay: Int, mode: Int): Int =
    calcWeek(epochDay, normalize(mode)) % 1000

  /** YEARWEEK forces NO_ZERO after mode normalization
    * (reference: func_yearweek.cpp:133-134). */
  def yearweek(epochDay: Int, mode: Int): Int = {
    val r = calcWeek(epochDay, normalize(mode) | 2)
    (r / 1000) * 100 + (r % 1000)
  }
}

/** WEEK(date, mode) / YEARWEEK(date, mode) as a codegen'd expression over
  * Spark's internal date (int days since epoch). */
case class MySqlWeek(child: Expression, mode: Int, yearWeek: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = if (yearWeek) "mysql_yearweek" else "mysql_week"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DateType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires date, got ${other.simpleString}")
    }

  private def fn: String = if (yearWeek) "yearweek" else "week"

  protected override def nullSafeEval(input: Any): Any =
    if (yearWeek) DateKernels.yearweek(input.asInstanceOf[Int], mode)
    else DateKernels.week(input.asInstanceOf[Int], mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DateKernels.$fn($c, $mode)")

  override protected def withNewChildInternal(newChild: Expression): MySqlWeek =
    copy(child = newChild)
}

object DateFunctions {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  /** MySQL WEEK(d, mode), modes 0-7. */
  def week(d: Column, mode: Int): Column =
    column(MySqlWeek(expression(d.cast("date")), mode, yearWeek = false))

  /** MySQL YEARWEEK(d, mode) → YYYYWW. */
  def yearweek(d: Column, mode: Int = 0): Column =
    column(MySqlWeek(expression(d.cast("date")), mode, yearWeek = true))
}
