package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.TimestampType
import org.apache.spark.unsafe.types.UTF8String

/** Rewrite `date_trunc('day', ts) = <literal>` into the equivalent
  * half-open range `ts >= L AND ts < L + 1 day` (SURVEY §2 E51 stretch:
  * a `Rule[LogicalPlan]` registered via `SparkSessionExtensions`).
  *
  * Why it matters at scale: the truncation form wraps the column in an
  * expression, so the parquet reader cannot push the predicate into the
  * scan — every row group is read and filtered post-hoc. The range form
  * pushes down (`PushedFilters: [GreaterThanOrEqual(ts,..), LessThan(..)]`)
  * and prunes row groups / partitions by min-max stats — on a 100 TB
  * time-partitioned table that is the difference between scanning one day
  * and scanning everything. Spark's own optimizer (4.1) does not unwrap
  * `date_trunc`; it does unwrap casts, which this rule complements.
  *
  * Semantics preserved exactly:
  *  - day-aligned literal L → `ts >= L AND ts < L+1d` (same truth table,
  *    incl. NULL ts → NULL);
  *  - misaligned L (can never equal a truncated value) → `ts >= L AND
  *    ts < L`, i.e. constant-false with NULL propagation intact;
  *  - only applies under UTC evaluation (alignment is zone-relative) and
  *    to day granularity; everything else is left untouched.
  */
object TruncEqToRangeRule extends Rule[LogicalPlan] {

  private val DayUs = 86400000000L

  private def utc(tz: Option[String]): Boolean =
    tz.forall(z => z == "UTC" || z == "Etc/UTC" || z == "Z" || z == "+00:00")

  private def dayFmt(fmt: Expression): Boolean = fmt match {
    case Literal(s: UTF8String, _) => s.toString.equalsIgnoreCase("day")
    case _ => false
  }

  private def range(ts: Expression, v: Long): Expression = {
    val aligned = Math.floorMod(v, DayUs) == 0L
    val upper = if (aligned) v + DayUs else v
    And(GreaterThanOrEqual(ts, Literal(v, TimestampType)),
      LessThan(ts, Literal(upper, TimestampType)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case EqualTo(TruncTimestamp(fmt, ts, tz), Literal(v: Long, TimestampType))
        if dayFmt(fmt) && utc(tz) && ts.dataType == TimestampType =>
      range(ts, v)
    case EqualTo(Literal(v: Long, TimestampType), TruncTimestamp(fmt, ts, tz))
        if dayFmt(fmt) && utc(tz) && ts.dataType == TimestampType =>
      range(ts, v)
  }
}
