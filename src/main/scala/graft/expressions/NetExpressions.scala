package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.dns.DnsWire

/** Native Catalyst expressions for the three functions Spark lacks
  * (SURVEY.md §2.9 F3/F4/F5) — the codegen'd upgrade path §7.2 reserves for
  * the ingest hot path. Compared to the Scala-UDF versions these avoid
  * per-row encoder round-trips and keep the enclosing WholeStageCodegen
  * span intact: `doGenCode` emits a direct static call on the pure
  * `graft.dns` kernel.
  */
/** Java-callable kernels used by generated code. TOP-LEVEL object on
  * purpose: scalac emits static forwarders only for top-level objects —
  * the round-1 nested `NetExpressions.Bridge` was unresolvable from
  * generated Java, so janino failed the compile and every plan containing
  * these expressions silently fell back to interpreted projection. */
object NetKernels {
  def isIpv4(s: UTF8String): Boolean = DnsWire.isIpv4(if (s == null) null else s.toString)
  def isIpv6(s: UTF8String): Boolean = DnsWire.isIpv6(if (s == null) null else s.toString)

  /** DNS wire message → InternalRow(rcode, rdatas, rdatas6, cnames), or
    * null for malformed input (the collector's per-row barrier,
    * /root/reference/src/collector.py:76-78). */
  def parseToRow(wire: Array[Byte]): InternalRow =
    DnsWire.parseOpt(wire) match {
      case Some(a) =>
        InternalRow(
          a.rcode,
          new GenericArrayData(a.rdatas4.map(UTF8String.fromString).toArray[Any]),
          new GenericArrayData(a.rdatas6.map(UTF8String.fromString).toArray[Any]),
          new GenericArrayData(a.cnames.map(UTF8String.fromString).toArray[Any])
        )
      case None => null
    }
}

object NetExpressions {

  private[expressions] def requireType(child: Expression, t: DataType, name: String): TypeCheckResult =
    if (child.dataType == t) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$name requires ${t.simpleString} input, got ${child.dataType.simpleString}")

  val answerStruct: StructType = StructType(Seq(
    StructField("rcode", IntegerType, nullable = false),
    StructField("rdatas", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("rdatas6", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("cnames", ArrayType(StringType, containsNull = false), nullable = false)
  ))
}

/** Strict dotted-quad predicate (ClickHouse `isIPv4String` semantics). */
case class IsIPv4(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = NetExpressions.requireType(child, StringType, prettyName)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "is_ipv4"

  override protected def nullSafeEval(input: Any): Any =
    NetKernels.isIpv4(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NetKernels.isIpv4($c)")

  override protected def withNewChildInternal(newChild: Expression): IsIPv4 = copy(child = newChild)
}

/** Pure-string IPv6 predicate (never resolves). */
case class IsIPv6(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = NetExpressions.requireType(child, StringType, prettyName)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "is_ipv6"

  override protected def nullSafeEval(input: Any): Any =
    NetKernels.isIpv6(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NetKernels.isIpv6($c)")

  override protected def withNewChildInternal(newChild: Expression): IsIPv6 = copy(child = newChild)
}

/** RFC-1035 answer parse: binary wire message → typed struct, null on
  * malformed input (F3, collector.py:29-41). */
case class ParseDnsAnswer(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = NetExpressions.requireType(child, BinaryType, prettyName)
  override def dataType: DataType = NetExpressions.answerStruct
  override def nullable: Boolean = true
  override def prettyName: String = "parse_dns_answer"

  override protected def nullSafeEval(input: Any): Any =
    NetKernels.parseToRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.NetKernels.parseToRow($c);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): ParseDnsAnswer =
    copy(child = newChild)
}

/** `SparkSessionExtensions` hook: register the native functions for SQL use
  * (`spark.sql.extensions=graft.expressions.GraftExtensions`), plus a
  * programmatic registrar for already-built sessions. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftExtensions.inject(ext)
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier

  private val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "is_ipv4" -> (args => IsIPv4(args.head)),
    "is_ipv6" -> (args => IsIPv6(args.head)),
    "parse_dns_answer" -> (args => ParseDnsAnswer(args.head))
  )

  def inject(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }

  /** Register on a live session (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
