package graft.plans

import java.time.DateTimeException

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TimeZoneAwareExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{DateTimeUtils, LegacyDateFormats, TimestampFormatter}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Portable

/** Hand-rolled prefix sniffers equivalent to the `rlike` dispatch regexes in
  * [[Portable.TsDispatch]] / [[Portable.DateDispatch]]. Each check matches its
  * regex exactly (the patterns are pure prefixes over disjoint character
  * classes, so greedy-vs-lazy quantifier order cannot change the boolean
  * outcome), and checks run in table order — identical selection to the
  * portable CASE/rlike chain's first-match-wins evaluation.
  */
private[plans] object MultiFormatDispatch {
  @inline private def d(s: String, i: Int): Boolean =
    i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '9'
  @inline private def c(s: String, i: Int, ch: Char): Boolean =
    i < s.length && s.charAt(i) == ch
  @inline private def letter(s: String, i: Int): Boolean = i < s.length && {
    val x = s.charAt(i)
    (x >= 'A' && x <= 'Z') || (x >= 'a' && x <= 'z')
  }
  /** Length of the maximal [A-Za-z]+ run at position 0. */
  @inline private def letterRun(s: String): Int = {
    var i = 0
    while (letter(s, i)) i += 1
    i
  }
  /** `^[0-9]{1,2}<ch>` */
  @inline private def d12(s: String, ch: Char): Boolean =
    d(s, 0) && (c(s, 1, ch) || (d(s, 1) && c(s, 2, ch)))
  /** `[0-9]{1,2}<ch>` at offset `at`. */
  @inline private def d12At(s: String, at: Int, ch: Char): Boolean =
    d(s, at) && (c(s, at + 1, ch) || (d(s, at + 1) && c(s, at + 2, ch)))
  /** `^[0-9]{4}<ch>` */
  @inline private def d4(s: String, ch: Char): Boolean =
    d(s, 0) && d(s, 1) && d(s, 2) && d(s, 3) && c(s, 4, ch)

  /** Index into [[Portable.TsDispatch]] of the first matching dispatch regex,
    * -1 when none match. Must be applied to the TRIMMED string (the portable
    * chain evaluates `rlike` on `trim(col)`). */
  def sniffTs(s: String): Int = {
    if (d4(s, '-')) return 0 // ^[0-9]{4}-
    if (d4(s, '/')) return 1 // ^[0-9]{4}/
    if (d12(s, '/')) return 2 // ^[0-9]{1,2}/
    if (d12(s, '-')) return 3 // ^[0-9]{1,2}-
    if (d12(s, '.')) return 4 // ^[0-9]{1,2}\.
    if (d(s, 0) && d(s, 1) && d(s, 2) && d(s, 3) && d(s, 4) && d(s, 5) &&
      d(s, 6) && d(s, 7) && c(s, 8, ' ')) return 5 // ^[0-9]{8}<space>
    val lr = letterRun(s)
    if (lr >= 1 && c(s, lr, ' ')) {
      if (d12At(s, lr + 1, ' ')) return 6 // ^[A-Za-z]+ [0-9]{1,2}<space>
      if (d12At(s, lr + 1, ',')) return 8 // ^[A-Za-z]+ [0-9]{1,2},
    }
    if ((d(s, 0) && c(s, 1, ' ') && letter(s, 2)) ||
      (d(s, 0) && d(s, 1) && c(s, 2, ' ') && letter(s, 3))) return 7 // ^[0-9]{1,2} [A-Za-z]
    -1
  }

  /** Index into [[Portable.DateDispatch]] of the first matching dispatch
    * regex, -1 when none. Applied to the RAW string (the date chain does not
    * trim — same as its `rlike`). */
  def sniffDate(s: String): Int = {
    if (d4(s, '-')) return 0 // ^[0-9]{4}-
    if (d12(s, '/')) return 1 // ^[0-9]{1,2}/
    if (d12(s, '.')) return 2 // ^[0-9]{1,2}\.
    if (s.length == 8 && d(s, 0) && d(s, 1) && d(s, 2) && d(s, 3) &&
      d(s, 4) && d(s, 5) && d(s, 6) && d(s, 7)) return 3 // ^[0-9]{8}$
    -1
  }
}

/** Native expression: one-pass multi-format TIMESTAMP_NTZ parse, generated
  * from the same [[Portable.TsDispatch]] table as the portable CASE/rlike
  * chain ([[graft.operators.Cleaning.parseTimestampMultiPortable]]) and the
  * DuckDB oracle ([[Portable.tsMultiDuck]]).
  *
  * Value-identical to `CASE WHEN trim(x) RLIKE re_i THEN
  * cast(try_to_timestamp(trim(x), fmt_i) as timestamp_ntz) ... END` under the
  * engine's pinned UTC session (graft.core.Sessions): the per-format parsers
  * are built by the SAME `TimestampFormatter` factory call `to_timestamp`
  * uses (format, session zone, SIMPLE_DATE_FORMAT legacy hint, isParsing),
  * parse failures null out exactly like `try_to_timestamp` (DateTimeException
  * / ParseException), and `parseWithoutTimeZone` yields the parsed wall clock
  * — which is what LTZ-parse-then-cast-to-NTZ yields under UTC. Pinned by
  * PortableParitySpec; the end-to-end silver gates stay the bitwise proof.
  *
  * The win is physical, not semantic: the chain re-trims and regex-scans the
  * value once per branch and inlines the whole 9-branch tree at every use
  * site after projection collapse; this is one trim, one prefix sniff, ≤1
  * format parse per value, inside whole-stage codegen (reference-object call,
  * no fallback). The multi-format parse is the silver family's dominant cost
  * (reference: silver/spark_procedures/users.sql:14-22).
  */
case class MultiFormatTimestamp(child: Expression, timeZoneId: Option[String] = None)
  extends UnaryExpression with TimeZoneAwareExpression {

  override def dataType: DataType = TimestampNTZType
  override def prettyName: String = "graft_ts_multi"

  override def withTimeZone(timeZoneId: String): TimeZoneAwareExpression =
    copy(timeZoneId = Some(timeZoneId))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ts_multi expects a string argument, got $other")
  }

  @transient private lazy val formatters: Array[TimestampFormatter] =
    Portable.TsDispatch.map { case (_, fmt, _) =>
      TimestampFormatter(fmt, zoneId, LegacyDateFormats.SIMPLE_DATE_FORMAT, isParsing = true)
    }.toArray

  /** Boxed micros-since-epoch of the parsed wall clock, or null. Public so
    * generated code can call it through the expression reference. */
  def parseToMicros(u: UTF8String): java.lang.Long = {
    val s = u.trim().toString // Spark trim(col): ASCII-space ends, like the chain
    val idx = MultiFormatDispatch.sniffTs(s)
    if (idx < 0) null
    else try java.lang.Long.valueOf(formatters(idx).parseWithoutTimeZone(s, true))
    catch {
      case _: DateTimeException | _: java.text.ParseException => null
    }
  }

  override def nullSafeEval(input: Any): Any = parseToMicros(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mft", this, classOf[MultiFormatTimestamp].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("micros")
      s"""
         |java.lang.Long $r = $ref.parseToMicros($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native expression: one-pass multi-format DATE parse from
  * [[Portable.DateDispatch]] — the `graft_ts_multi` twin for
  * [[graft.operators.Cleaning.parseDateMulti]]'s default formats. Matches
  * `CASE WHEN x RLIKE re_i THEN to_date(try_to_timestamp(x, fmt_i)) END`
  * exactly: same raw (untrimmed) dispatch target, same formatter factory,
  * same null-on-parse-error classes, and the LTZ-micros → session-zone day
  * truncation is the same `microsToDays` call `to_date`'s cast performs.
  */
case class MultiFormatDate(child: Expression, timeZoneId: Option[String] = None)
  extends UnaryExpression with TimeZoneAwareExpression {

  override def dataType: DataType = DateType
  override def prettyName: String = "graft_date_multi"

  override def withTimeZone(timeZoneId: String): TimeZoneAwareExpression =
    copy(timeZoneId = Some(timeZoneId))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_date_multi expects a string argument, got $other")
  }

  @transient private lazy val formatters: Array[TimestampFormatter] =
    Portable.DateDispatch.map { case (_, fmt, _) =>
      TimestampFormatter(fmt, zoneId, LegacyDateFormats.SIMPLE_DATE_FORMAT, isParsing = true)
    }.toArray

  /** Boxed epoch days, or null. Public for generated code. */
  def parseToDays(u: UTF8String): java.lang.Integer = {
    val s = u.toString // the date chain dispatches on the RAW string
    val idx = MultiFormatDispatch.sniffDate(s)
    if (idx < 0) null
    else try java.lang.Integer.valueOf(
      DateTimeUtils.microsToDays(formatters(idx).parse(s), zoneId))
    catch {
      case _: DateTimeException | _: java.text.ParseException => null
    }
  }

  override def nullSafeEval(input: Any): Any = parseToDays(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mfd", this, classOf[MultiFormatDate].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("days")
      s"""
         |java.lang.Integer $r = $ref.parseToDays($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.intValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
