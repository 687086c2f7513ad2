package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._
import java.time.{LocalDate, ZoneId}

/** Catalyst optimizer rule: rewrite `year(c) = <year literal>` filter
  * predicates into half-open RANGE predicates on `c` itself —
  * `c >= 'y-01-01' AND c < '(y+1)-01-01'` — so parquet min/max row-group
  * skipping and partition pruning can fire. A function-of-column predicate
  * is opaque to both (SURVEY.md F5: the reference filters
  * `year(dt_coleta) == y` three times per pipeline-B run;
  * `views/Ressarcimento` adds the manual range twin by hand — this rule
  * generalizes that rewrite to every query in the session).
  *
  * Supported shapes (both literal orders):
  *  - `year(c)` over a DATE column — boundaries are date literals;
  *  - `year(c)` over TIMESTAMP_NTZ (Catalyst plans it as
  *    `Year(Cast(c AS DATE))`) — timezone-free microsecond boundaries;
  *  - `year(c)` over TIMESTAMP (LTZ) — boundaries at midnight in the
  *    cast's timezone (falling back to the session zone), exactly the
  *    zone the `Cast` to DATE itself uses, so the rewrite is correct in
  *    ANY session timezone, not only the engine's UTC pin.
  *
  * NULL semantics are preserved: for NULL `c`, `year(c) = y` and the
  * range conjunction both evaluate to NULL (row filtered) — so the
  * rewrite is a pure pushdown enabler, observable only in plans. The
  * 61-query oracle gate runs with this rule installed, which pins that
  * claim against an independent engine.
  */
object YearRangeRewrite extends Rule[LogicalPlan] {

  /** (lo, hi) literals for [y-01-01, (y+1)-01-01) in `c`'s type, or None
    * when the column type (or zone resolution) isn't one we rewrite. */
  private def bounds(c: Expression, tz: Option[String], y: Int): Option[(Literal, Literal)] = {
    val jan1 = LocalDate.of(y, 1, 1)
    val jan1Next = LocalDate.of(y + 1, 1, 1)
    c.dataType match {
      case DateType =>
        Some((Literal(jan1.toEpochDay.toInt, DateType),
          Literal(jan1Next.toEpochDay.toInt, DateType)))
      case TimestampNTZType =>
        def micros(d: LocalDate) = d.toEpochDay * 86400L * 1000000L
        Some((Literal(micros(jan1), TimestampNTZType),
          Literal(micros(jan1Next), TimestampNTZType)))
      case TimestampType =>
        val zone = ZoneId.of(tz.getOrElse(SQLConf.get.sessionLocalTimeZone))
        def micros(d: LocalDate) =
          DateTimeUtils.instantToMicros(d.atStartOfDay(zone).toInstant)
        Some((Literal(micros(jan1), TimestampType),
          Literal(micros(jan1Next), TimestampType)))
      case _ => None
    }
  }

  /** The column under `year(...)`: a direct DATE child, or the operand of
    * the date cast Catalyst inserts for timestamp children (the cast's
    * own timezone rides along so LTZ boundaries use the SAME zone). */
  private def unwrap(e: Expression): Option[(Expression, Option[String])] = e match {
    case c if c.dataType == DateType && c.deterministic => Some((c, None))
    case _ => None
  }

  private def unwrapYearChild(inner: Expression): Option[(Expression, Option[String])] =
    inner match {
      case Cast(c, DateType, tz, _)
        if (c.dataType == TimestampNTZType || c.dataType == TimestampType) && c.deterministic =>
        Some((c, tz))
      case other => unwrap(other)
    }

  private def yearValue(l: Literal): Option[Int] = l.value match {
    case i: Int => Some(i)
    case _ => None // year() returns IntegerType; anything else means an
                   // exotic coercion we leave alone
  }

  private def range(inner: Expression, lit: Literal): Option[Expression] =
    for {
      (c, tz) <- unwrapYearChild(inner)
      y <- yearValue(lit)
      (lo, hi) <- bounds(c, tz, y)
    } yield And(GreaterThanOrEqual(c, lo), LessThan(c, hi))

  private def rewriteCond(cond: Expression): Expression = cond.transformUp {
    case eq @ EqualTo(Year(inner), l: Literal) => range(inner, l).getOrElse(eq)
    case eq @ EqualTo(l: Literal, Year(inner)) => range(inner, l).getOrElse(eq)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val r = rewriteCond(cond)
      if (r.fastEquals(cond)) f else Filter(r, child)
  }
}
