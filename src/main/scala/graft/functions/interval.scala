package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.{CalendarInterval, UTF8String}

/** BigQuery INTERVAL verbs over Spark's CalendarInterval — which IS
  * BigQuery's three-part model (months, days, microseconds kept
  * separate, no cross-part normalization except through JUSTIFY).
  * make_interval / EXTRACT / timestamp arithmetic / interval addition
  * are Spark-native on this carrier; these natives add the two things
  * Spark lacks:
  *
  *  - the JUSTIFY trio (Postgres/BigQuery semantics): JUSTIFY_HOURS
  *    rolls whole 24-hour blocks of the micros part into days,
  *    JUSTIFY_DAYS rolls whole 30-day blocks into months,
  *    JUSTIFY_INTERVAL composes hours-then-days and then applies the
  *    Postgres mixed-sign borrow (a lower-order part with the
  *    opposite sign of the result borrows one unit from the field
  *    above, so '1 month -1 hour' → 29 days 23:00:00). Divisions
  *    truncate toward zero (a negative part keeps its sign — the C
  *    rule both engines share).
  *  - BigQuery's canonical text form `[-]Y-M [-]D [-]H:M:S[.F]` —
  *    sign carried PER GROUP, components unpadded, the fractional
  *    part printed only when nonzero and trimmed of trailing zeros
  *    (CAST(interval AS STRING) in BigQuery; Spark's CAST prints
  *    `1 years 2 months ...` instead, so the canonical text is a
  *    registry function, graft_interval_text).
  */
object IntervalOps {
  def justify(i: CalendarInterval, mode: String): CalendarInterval = {
    var months = i.months.toLong
    var days = i.days.toLong
    var micros = i.microseconds
    if (mode == "hours" || mode == "interval") {
      days += micros / 86400000000L
      micros %= 86400000000L
    }
    if (mode == "days" || mode == "interval") {
      months += days / 30L
      days %= 30L
    }
    // JUSTIFY_INTERVAL only (Postgres interval_justify, the semantics
    // BigQuery documents): after the whole-block rolls, mixed-sign
    // parts borrow one unit from the next-higher field so every part
    // carries the sign of the whole — '1 month -1 hour' normalizes to
    // 29 days 23:00:00, not 1 month -1:00:00. JUSTIFY_HOURS and
    // JUSTIFY_DAYS deliberately do NOT borrow (also the Postgres rule).
    if (mode == "interval") {
      if (months > 0 && (days < 0 || (days == 0 && micros < 0))) {
        days += 30; months -= 1
      } else if (months < 0 && (days > 0 || (days == 0 && micros > 0))) {
        days -= 30; months += 1
      }
      if (days > 0 && micros < 0) { micros += 86400000000L; days -= 1 }
      else if (days < 0 && micros > 0) { micros -= 86400000000L; days += 1 }
    }
    require(months >= Int.MinValue && months <= Int.MaxValue &&
      days >= Int.MinValue && days <= Int.MaxValue,
      s"JUSTIFY overflow: months=$months days=$days")
    new CalendarInterval(months.toInt, days.toInt, micros)
  }

  def text(i: CalendarInterval): UTF8String = {
    val sb = new java.lang.StringBuilder(24)
    val am = Math.abs(i.months.toLong)
    if (i.months < 0) sb.append('-')
    sb.append(am / 12).append('-').append(am % 12).append(' ')
    sb.append(i.days).append(' ')
    val au = Math.abs(i.microseconds)
    if (i.microseconds < 0) sb.append('-')
    sb.append(au / 3600000000L).append(':')
      .append(au % 3600000000L / 60000000L).append(':')
      .append(au % 60000000L / 1000000L)
    val frac = au % 1000000L
    if (frac > 0) {
      var f = f"$frac%06d"
      while (f.endsWith("0")) f = f.substring(0, f.length - 1)
      sb.append('.').append(f)
    }
    UTF8String.fromString(sb.toString)
  }
}

/** JUSTIFY_DAYS / JUSTIFY_HOURS / JUSTIFY_INTERVAL (`mode` picks). */
case class JustifyCalInterval(child: Expression, mode: String)
    extends UnaryExpression with ExpectsInputTypes {
  require(mode == "days" || mode == "hours" || mode == "interval",
    s"unknown justify mode '$mode'")
  override def inputTypes = Seq(CalendarIntervalType)
  override def dataType: DataType = CalendarIntervalType
  def compute(i: CalendarInterval): CalendarInterval = IntervalOps.justify(i, mode)
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[CalendarInterval])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("justifyCalInterval", this)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }
  override protected def withNewChildInternal(newChild: Expression): JustifyCalInterval =
    copy(child = newChild)
}

/** BigQuery's canonical INTERVAL text. */
case class CalIntervalText(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(CalendarIntervalType)
  override def dataType: DataType = StringType
  def compute(i: CalendarInterval): UTF8String = IntervalOps.text(i)
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[CalendarInterval])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("calIntervalText", this)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }
  override protected def withNewChildInternal(newChild: Expression): CalIntervalText =
    copy(child = newChild)
}
