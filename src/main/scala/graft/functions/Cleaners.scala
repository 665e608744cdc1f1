package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Field-cleaning functions with the semantics of the reference Mapper
  * (/root/reference/src/Service/Mapper/Mapper.php:21-52), built from
  * codegen'd Catalyst expressions only — no UDFs, so the whole map stage
  * stays inside WholeStageCodegen at 100 TB.
  */
object Cleaners {

  /** Chars the reference keeps: latin + cyrillic letters, digits, dot
    * (PHP `preg_replace('/[^a-zа-я\d.]/ui','')`).
    */
  private val KeepPattern = "[^a-zA-Zа-яА-Я0-9.]"

  /** Strip everything but letters/digits/dot. */
  def cleanString(c: Column): Column =
    regexp_replace(c.cast("string"), KeepPattern, "")

  /** Cleaned string truncated to 13 chars (UPC/EAN-13 width). Native
    * single-pass expression; null in → null out, like the regex twin.
    */
  def cleanUpc(c: Column): Column = call_function("graft_clean_upc", c.cast("string"))

  /** Digits only → long; null/empty/overflow → 0 (PHP intval semantics). */
  def cleanInteger(c: Column): Column =
    coalesce(call_function("graft_clean_int", c.cast("string")), lit(0L))

  /** Comma→dot, strip junk, take the leading numeric prefix → double;
    * null / no parseable prefix → 0.0 (PHP floatval: "1.2.3" → 1.2).
    */
  def cleanFloat(c: Column): Column =
    coalesce(call_function("graft_clean_float", c.cast("string")), lit(0.0))

  // -- declarative regex twins (the original formulations): kept for
  //    cross-validation specs and for sessions without graft extensions --

  def declarativeCleanUpc(c: Column): Column = substring(cleanString(c), 1, 13)

  def declarativeCleanInteger(c: Column): Column =
    coalesce(regexp_replace(c.cast("string"), "[^0-9]", "").cast("long"), lit(0L))

  def declarativeCleanFloat(c: Column): Column = {
    val s = regexp_replace(cleanString(regexp_replace(c.cast("string"), ",", ".")), "[^0-9.]", "")
    coalesce(regexp_extract(s, "^([0-9]*\\.?[0-9]*)", 1).cast("double"), lit(0.0))
  }

  /** Uppercased/trimmed value if it is a valid 10-char alnum ASIN, else null
    * (PHP `asinValidate`).
    */
  def asinValidate(c: Column): Column = {
    val v = upper(trim(c.cast("string")))
    when(v.rlike("^[A-Z0-9]{10}$"), v)
  }
}
