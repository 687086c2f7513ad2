package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._
import java.time.{LocalDate, ZoneId}

/** Catalyst optimizer rule: rewrite `year(c) <cmp> <year literal>` filter
  * predicates (=, <, <=, >, >=, IN — both literal orders) into half-open
  * RANGE predicates on `c` itself — e.g. `year(c) = y` becomes
  * `c >= 'y-01-01' AND c < '(y+1)-01-01'` — so parquet min/max row-group
  * skipping and partition pruning can fire. A function-of-column predicate
  * is opaque to both (SURVEY.md F5: the reference filters
  * `year(dt_coleta) == y` three times per pipeline-B run;
  * `views/Ressarcimento` adds the manual range twin by hand — this rule
  * generalizes that rewrite to every query in the session).
  *
  * Supported column shapes under `year(...)`:
  *  - `year(c)` over a DATE column — boundaries are date literals;
  *  - `year(c)` over TIMESTAMP_NTZ (Catalyst plans it as
  *    `Year(Cast(c AS DATE))`) — timezone-free microsecond boundaries;
  *  - `year(c)` over TIMESTAMP (LTZ) — boundaries at midnight in the
  *    cast's timezone (falling back to the session zone), exactly the
  *    zone the `Cast` to DATE itself uses, so the rewrite is correct in
  *    ANY session timezone, not only the engine's UTC pin.
  *
  * Inequalities unwrap monotonically (year is non-decreasing in the
  * column); IN-lists become an OR of ranges, capped at [[MaxInYears]]
  * distinct years and skipped entirely if the list carries NULL (IN's
  * NULL-on-miss differs from an OR of ranges under NOT).
  *
  * NULL semantics are preserved: for NULL `c`, `year(c) = y` and the
  * range conjunction both evaluate to NULL (row filtered) — so the
  * rewrite is a pure pushdown enabler, observable only in plans. The
  * 61-query oracle gate runs with this rule installed, which pins that
  * claim against an independent engine.
  */
object YearRangeRewrite extends Rule[LogicalPlan] {

  /** Literal for y-01-01T00:00 in `c`'s type, or None when the column
    * type (or zone resolution, or a year outside LocalDate's range)
    * isn't one we rewrite. */
  private def startOfYear(c: Expression, tz: Option[String], y: Int): Option[Literal] =
    try {
      val jan1 = LocalDate.of(y, 1, 1)
      c.dataType match {
        case DateType =>
          // exact conversions: a year near the type's edge must fall back
          // to no-rewrite (ArithmeticException), never wrap into a garbage
          // bound that silently filters valid rows
          Some(Literal(Math.toIntExact(jan1.toEpochDay), DateType))
        case TimestampNTZType =>
          Some(Literal(
            Math.multiplyExact(jan1.toEpochDay, 86400L * 1000000L), TimestampNTZType))
        case TimestampType =>
          val zone = ZoneId.of(tz.getOrElse(SQLConf.get.sessionLocalTimeZone))
          Some(Literal(
            DateTimeUtils.instantToMicros(jan1.atStartOfDay(zone).toInstant),
            TimestampType))
        case _ => None
      }
    } catch { case _: Exception => None }

  /** (lo, hi) literals for [y-01-01, (y+1)-01-01) in `c`'s type. */
  private def bounds(c: Expression, tz: Option[String], y: Int): Option[(Literal, Literal)] =
    for (lo <- startOfYear(c, tz, y); hi <- startOfYear(c, tz, y + 1)) yield (lo, hi)

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

  /** One-sided bound: `year(c) <op> y` unwraps monotonically —
    * >= y ⇒ c >= start(y); > y ⇒ c >= start(y+1); <= y ⇒ c < start(y+1);
    * < y ⇒ c < start(y). NULL-ness is preserved (both forms NULL out on a
    * NULL column), so the rewrite stays safe under NOT. */
  private def oneSided(inner: Expression, lit: Literal,
                       boundYearOffset: Int, lower: Boolean): Option[Expression] =
    for {
      (c, tz) <- unwrapYearChild(inner)
      y <- yearValue(lit)
      b <- startOfYear(c, tz, y + boundYearOffset)
    } yield if (lower) GreaterThanOrEqual(c, b) else LessThan(c, b)

  /** IN-list over distinct non-null year literals → OR of ranges. Capped
    * so a degenerate thousand-year list can't explode the predicate; a
    * list containing NULL is left alone (IN's NULL-on-miss semantics
    * differ from an OR of ranges under e.g. NOT). */
  private val MaxInYears = 31
  private def inRanges(inner: Expression, list: Seq[Expression]): Option[Expression] = {
    val lits = list.collect { case l: Literal => l }
    // empty IN-list (isin() with zero args): nothing to rewrite, and the
    // reduceLeft below would throw — an optimizer rule must never be able
    // to crash planning, whatever earlier batches did or didn't eliminate
    if (lits.isEmpty || lits.length != list.length || lits.exists(_.value == null) ||
        lits.length > MaxInYears) None
    else {
      val ranges = lits.distinct.map(range(inner, _))
      if (ranges.exists(_.isEmpty)) None
      else Some(ranges.flatten.reduceLeft(Or))
    }
  }

  private def rewriteCond(cond: Expression): Expression = cond.transformUp {
    case eq @ EqualTo(Year(inner), l: Literal) => range(inner, l).getOrElse(eq)
    case eq @ EqualTo(l: Literal, Year(inner)) => range(inner, l).getOrElse(eq)
    case e @ GreaterThanOrEqual(Year(i), l: Literal) => oneSided(i, l, 0, lower = true).getOrElse(e)
    case e @ GreaterThan(Year(i), l: Literal) => oneSided(i, l, 1, lower = true).getOrElse(e)
    case e @ LessThanOrEqual(Year(i), l: Literal) => oneSided(i, l, 1, lower = false).getOrElse(e)
    case e @ LessThan(Year(i), l: Literal) => oneSided(i, l, 0, lower = false).getOrElse(e)
    // literal-first comparisons: y <op> year(c) mirrors to year(c) <flip> y
    case e @ GreaterThanOrEqual(l: Literal, Year(i)) => oneSided(i, l, 1, lower = false).getOrElse(e)
    case e @ GreaterThan(l: Literal, Year(i)) => oneSided(i, l, 0, lower = false).getOrElse(e)
    case e @ LessThanOrEqual(l: Literal, Year(i)) => oneSided(i, l, 0, lower = true).getOrElse(e)
    case e @ LessThan(l: Literal, Year(i)) => oneSided(i, l, 1, lower = true).getOrElse(e)
    case e @ In(Year(i), list) => inRanges(i, list).getOrElse(e)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val r = rewriteCond(cond)
      if (r.fastEquals(cond)) f else Filter(r, child)
  }
}
