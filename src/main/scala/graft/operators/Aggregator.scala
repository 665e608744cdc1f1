package graft.operators

import graft.config.{InputConfig, SourceRouter}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.monotonically_increasing_id

/** End-to-end pipeline orchestrator mirroring the reference Aggregator
  * (/root/reference/src/Service/Aggregator/Aggregator.php:62-89):
  *
  *   config → route(type_id) → read → [multi-source merge] → map/clean →
  *   keyed dedupe → produce
  *
  * The network transports behind each type_id are out of scope (zero
  * egress); a [[SourceResolver]] supplies the DataFrame for a (typeId,
  * source) pair — in production that's a path on the data lake, in tests a
  * local file or in-memory frame. Everything from the resolver onward is
  * the distributed data plane.
  */
object Aggregator {

  /** type_id + source locator → rows. Implementations route on
    * SourceRouter.handlerFor(typeId) ("csv_http", "excel_sftp", …).
    */
  trait SourceResolver {
    def read(spark: SparkSession, typeId: Int, source: String, range: Option[String]): DataFrame
  }

  /** Synthetic recency column stamped at the read boundary when the caller
    * doesn't name one: `monotonically_increasing_id()` applied BEFORE any
    * shuffle encodes (partition, offset) — i.e. (file, row) order for file
    * sources — the distributed analog of the reference's arrival order.
    * Stable across re-runs on the same input; a true ingest offset column
    * (Kafka offset, file sequence) is still preferable when one exists.
    */
  val IngestSeqCol = "__graft_ingest_seq"

  private def stampIngest(df: DataFrame): DataFrame =
    df.withColumn(IngestSeqCol, monotonically_increasing_id())

  /** Run one config end to end and return the normalized feed (the rows the
    * reference would produce to Kafka).
    *
    * @param orderCol recency column for last-write-wins collisions — a real
    *                 per-row column (ingest offset, file sequence). When
    *                 None, an ingest sequence is stamped at the read
    *                 boundary ([[IngestSeqCol]]); within-sub-source recency
    *                 in multi-source mode always uses the stamped sequence,
    *                 mirroring the reference's per-source iteration order.
    */
  def run(spark: SparkSession, config: InputConfig, resolver: SourceResolver,
          key: String = "upc", orderCol: Option[String] = None): DataFrame = {
    val (raw: DataFrame, ord: String) =
      if (config.isMultiSource) {
        val subs = config.subSources
        require(subs.nonEmpty, "multi-source config with no sub-sources")
        val first = stampIngest(resolver.read(spark, subs.head.typeId, subs.head.filename,
          subs.head.range.orElse(config.range)))
        val feeds = subs.tail.map { sub =>
          SubSourceFeed(
            stampIngest(resolver.read(spark, sub.typeId, sub.filename, sub.range.orElse(config.range))),
            sub.key, sub.fields, orderCol = IngestSeqCol)
        }
        // the reference keys the first source and grafts later sources'
        // fields onto existing keys (Aggregator.php:110-136); the base
        // set's recency survives the merge for the final dedupe
        val merged = MultiSourceMerge.merge(first, subs.head.key, IngestSeqCol, feeds,
          keepOrderCol = orderCol.isEmpty)
        (merged, orderCol.getOrElse(IngestSeqCol))
      } else {
        val typeId = config.typeId.getOrElse(
          throw new IllegalArgumentException("No handler found for type \"null\"."))
        SourceRouter.handlerFor(typeId) // fail fast on unknown type
        val df = resolver.read(spark, typeId, config.source, config.range)
        orderCol match {
          case Some(c) => (df, c)
          case None    => (stampIngest(df), IngestSeqCol)
        }
      }

    val mapped = Mapper.mapColumns(raw, config.rules, config.supplierId, config.version,
      passthrough = Seq(ord))
    val mergeRules = config.rules.flatMap(r => r.merge.map(r.target -> _)).toMap
    if (mapped.columns.contains(key))
      KeyedMergeSet.dedupe(mapped, key, mergeRules, ord)
    else mapped.drop(IngestSeqCol)
  }
}
