package graft.operators

import graft.config.{InputConfig, SourceRouter}
import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** Run one config end to end and return the normalized feed (the rows the
    * reference would produce to Kafka).
    *
    * @param orderCol recency column for last-write-wins collisions; configs
    *                 name it explicitly because arrival order does not exist
    *                 on a cluster
    */
  def run(spark: SparkSession, config: InputConfig, resolver: SourceResolver,
          key: String = "upc", orderCol: String = "version"): DataFrame = {
    val raw: DataFrame =
      if (config.isMultiSource) {
        val subs = config.subSources
        require(subs.nonEmpty, "multi-source config with no sub-sources")
        val first = resolver.read(spark, subs.head.typeId, subs.head.filename,
          subs.head.range.orElse(config.range))
        val feeds = subs.tail.map { sub =>
          SubSourceFeed(
            resolver.read(spark, sub.typeId, sub.filename, sub.range.orElse(config.range)),
            sub.key, sub.fields, orderCol = sub.key)
        }
        // the reference keys the first source and grafts later sources'
        // fields onto existing keys (Aggregator.php:110-136)
        MultiSourceMerge.merge(first, subs.head.key, subs.head.key, feeds)
      } else {
        val typeId = config.typeId.getOrElse(
          throw new IllegalArgumentException("No handler found for type \"null\"."))
        SourceRouter.handlerFor(typeId) // fail fast on unknown type
        resolver.read(spark, typeId, config.source, config.range)
      }

    val mapped = Mapper.mapColumns(raw, config.rules, config.supplierId, config.version)
    val mergeRules = config.rules.flatMap(r => r.merge.map(r.target -> _)).toMap
    if (mapped.columns.contains(key))
      KeyedMergeSet.dedupe(mapped, key, mergeRules, orderCol)
    else mapped
  }
}
