package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A6: dataset statistics over the live view (reference
  * storage/parquet.py:294-304 via ftmq aggregation): per-bucket schema
  * facets plus country facets from the values of `prop_type = 'country'`
  * statements. One shuffle per facet family, partial aggregation first —
  * the whole result is facet-cardinality sized, never data sized.
  */
object Stats {

  /** Long-form facet table: (facet, key, entities, statements). */
  def facets(live: DataFrame): DataFrame = {
    val schemata = live
      .groupBy(col("bucket"), col("schema"))
      .agg(countDistinct(col("entity_id")).as("entities"),
        count(lit(1)).as("statements"))
      .select(lit("schemata").as("facet"),
        concat_ws("/", col("bucket"), col("schema")).as("key"),
        col("entities"), col("statements"))
    val countries = live
      .filter(col("prop_type") === "country")
      .groupBy(col("value"))
      .agg(countDistinct(col("entity_id")).as("entities"),
        count(lit(1)).as("statements"))
      .select(lit("countries").as("facet"), col("value").as("key"),
        col("entities"), col("statements"))
    schemata.unionByName(countries)
  }
}
