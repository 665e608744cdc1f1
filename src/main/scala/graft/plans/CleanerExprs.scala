package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass implementations of the reference Mapper's field cleaners
  * (/root/reference/src/Service/Mapper/Mapper.php:21-52). The declarative
  * twins in [[graft.functions.Cleaners]] chain 1–4 java.util.regex passes
  * per value; at 100 TB the map stage IS the pipeline, so these run one
  * char scan instead. Methods are static-forwarded for codegen: the
  * generated code calls them directly, keeping the whole map stage inside
  * one WholeStageCodegen span. Semantics are bit-compatible with the regex
  * forms (randomized property specs enforce it against the same PHP model).
  */
object CleanerOps {

  /** Char class of `[a-zA-Zа-яА-Я0-9.]` (the reference's keep-set). */
  @inline private def keep(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') ||
      c == '.' || (c >= 'а' && c <= 'я') || (c >= 'А' && c <= 'Я')

  /** strip non-keep chars, truncate to 13 — `substring(cleanString(s),1,13)` */
  def cleanUpc(s: UTF8String): UTF8String = {
    val str = s.toString
    val sb = new java.lang.StringBuilder(13)
    var i = 0
    while (i < str.length && sb.length < 13) {
      val c = str.charAt(i)
      if (keep(c)) sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** digits-only → long, empty/overflow → 0 — PHP intval semantics */
  def cleanInteger(s: UTF8String): Long = {
    val str = s.toString
    val sb = new java.lang.StringBuilder(20)
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (c >= '0' && c <= '9') sb.append(c)
      i += 1
    }
    if (sb.length == 0) 0L
    else try java.lang.Long.parseLong(sb.toString) catch { case _: NumberFormatException => 0L }
  }

  /** comma→dot, keep digits/dots, leading `[0-9]*\.?[0-9]*` prefix →
    * double, unparseable → 0.0 — PHP floatval semantics ("1.2.3" → 1.2)
    */
  def cleanFloat(s: UTF8String): Double = {
    val str = s.toString
    // pass 1 fused: commas become dots, everything but digits/dots drops
    val sb = new java.lang.StringBuilder(str.length)
    var i = 0
    while (i < str.length) {
      val c0 = str.charAt(i)
      val c = if (c0 == ',') '.' else c0
      if ((c >= '0' && c <= '9') || c == '.') sb.append(c)
      i += 1
    }
    // leading float prefix: digits, at most one dot, digits
    var j = 0
    while (j < sb.length && sb.charAt(j) >= '0' && sb.charAt(j) <= '9') j += 1
    if (j < sb.length && sb.charAt(j) == '.') {
      j += 1
      while (j < sb.length && sb.charAt(j) >= '0' && sb.charAt(j) <= '9') j += 1
    }
    if (j == 0 || (j == 1 && sb.charAt(0) == '.')) 0.0
    else java.lang.Double.parseDouble(sb.substring(0, j))
  }
}

/** `graft_clean_upc(string)` — native [[CleanerOps.cleanUpc]]. */
case class CleanUpcExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    CleanerOps.cleanUpc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CleanerOps.cleanUpc($c)")
  override protected def withNewChildInternal(newChild: Expression): CleanUpcExpr = copy(child = newChild)
  override def prettyName: String = "graft_clean_upc"
}

/** `graft_clean_int(string)` — native [[CleanerOps.cleanInteger]]; never null. */
case class CleanIntegerExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(input: Any): Any =
    CleanerOps.cleanInteger(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CleanerOps.cleanInteger($c)")
  override protected def withNewChildInternal(newChild: Expression): CleanIntegerExpr = copy(child = newChild)
  override def prettyName: String = "graft_clean_int"
}

/** `graft_clean_float(string)` — native [[CleanerOps.cleanFloat]]; never null. */
case class CleanFloatExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(input: Any): Any =
    CleanerOps.cleanFloat(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CleanerOps.cleanFloat($c)")
  override protected def withNewChildInternal(newChild: Expression): CleanFloatExpr = copy(child = newChild)
  override def prettyName: String = "graft_clean_float"
}
