package graft.operators

import graft.functions.Cleaners
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One column-mapping rule: rename `source` → `target`, optionally carrying a
  * keyed-merge rule ("min" | "max" | "addArray") consumed later by
  * [[KeyedMergeSet]] — mirrors the reference's `column_map_rules` entries
  * `"target": "source"` and `"target": ["source", "rule"]`
  * (/root/reference/src/Service/Mapper/Mapper.php:56-135).
  */
final case class MapRule(target: String, source: String, merge: Option[String] = None)

object MapRule {
  /** Parse the reference's JSON-ish map form: target -> (source | [source, rule]). */
  def fromPairs(pairs: Seq[(String, Either[String, (String, String)])]): Seq[MapRule] =
    pairs.map {
      case (t, Left(src))         => MapRule(t, src)
      case (t, Right((src, rule))) => MapRule(t, src, Some(rule))
    }
}

/** Column mapper: renames + cleans columns per rules and stamps the
  * supplier_id/version constants, exactly as the reference Mapper does —
  * but as a single narrow `select` (no shuffle, full codegen).
  *
  * Reference behavior mirrored:
  *  - target-name-driven cleaning: asin/upc/price/qty get their cleaners,
  *    anything else passes through (/root/reference/src/Service/Mapper/Mapper.php:95-112)
  *  - missing source column → error (Mapper.php:121-128); we fail fast at
  *    plan time instead of after a full pass over the data
  *  - stamps supplier_id + version (Mapper.php:115-117)
  */
object Mapper {

  def cleanerFor(target: String, c: Column): Column = target match {
    case "asin"  => Cleaners.asinValidate(c)
    case "upc"   => Cleaners.cleanUpc(c)
    case "price" => Cleaners.cleanFloat(c)
    case "qty"   => Cleaners.cleanInteger(c)
    case _       => c
  }

  /** @param passthrough extra columns (e.g. an ingest-sequence recency
    *                     column) carried through unmapped; names already
    *                     produced by the mapping are skipped, absent ones
    *                     ignored
    */
  def mapColumns(df: DataFrame, rules: Seq[MapRule], supplierId: Long, version: Long,
                 passthrough: Seq[String] = Nil): DataFrame = {
    val have = df.columns.toSet
    val missing = rules.map(_.source).filterNot(have)
    require(missing.isEmpty, s"Missing fields in data row for mapping: ${missing.mkString(", ")}")
    val mapped = rules.map(r => cleanerFor(r.target, col(r.source)).as(r.target))
    val produced = rules.map(_.target).toSet ++ Set("supplier_id", "version")
    val extra = passthrough.distinct.filter(c => have(c) && !produced(c)).map(col)
    df.select(mapped ++ Seq(lit(supplierId).as("supplier_id"), lit(version).as("version")) ++ extra: _*)
  }
}
