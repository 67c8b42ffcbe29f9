package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** J2 hierarchical config merge — reference `backend/common/scan_config.py:
  * 51-143` (`get_scan_config`): a file's effective config merges
  * `scan_config.json` files along its directory path, base-first:
  *
  *   - LIST keys (header_prefix, typo_list, …) EXTEND — values append in
  *     path order (shallow dirs first), then the file-specific layer last;
  *   - SCALAR keys (psm, chunk_strategy, crop.<axis>, …) OVERRIDE — the
  *     deepest (then file-specific) value wins.
  *
  * Spark-first shape: the config table is tiny (one row per (dir, scope,
  * key, ord, value)) and BROADCAST; docs prefix-join to every ancestor config
  * dir, then one aggregation per (doc, key) applies extend-vs-override. At
  * 100 TB this is a map-side broadcast join + one partial-aggregated groupBy
  * on (doc, key) — no dictionary ever reaches the driver.
  *
  * Config rows: (cfg_dir, scope, kind, key, ord, value)
  *   scope = "default" | a file stem (the reference's file-specific layer —
  *   applied only from the DEEPEST config dir on the doc's path that contains
  *   a config file AT ALL, matching the reference quirk that
  *   `scan_config_data` holds the last file read regardless of whether it has
  *   a "default" section);
  *   kind  = "list" | "scalar" | "sentinel" (a sentinel row marks a config
  *   file that contributes no table keys — e.g. empty, or only sections for
  *   other files' stems — so it still claims the deepest-file slot);
  *   ord = position within one config file's list.
  */
object ConfigMerge {

  /** @param docs    must carry `docCol` (unique id) and `pathCol`
    *                ("base/a/b/name.pdf")
    * @param configs (cfg_dir, scope, kind, key, ord, value)
    * @return one row per (doc id, key): list keys comma-joined in merge
    *         order, scalar keys resolved to the winning value
    */
  def effectiveConfigs(docs: DataFrame, configs: DataFrame,
      docCol: String = "doc_id", pathCol: String = "path"): DataFrame = {
    val dirCol = regexp_replace(col(pathCol), "/[^/]*$", "")
    val stemCol = regexp_replace(element_at(split(col(pathCol), "/"), -1), "\\.[^.]*$", "")
    val d = docs.select(col(docCol).as("doc_id"), dirCol.as("dir"), stemCol.as("stem"))
    // ancestor prefix match: cfg applies when the doc's dir IS cfg_dir or
    // lies below it
    val joined = d.join(broadcast(configs),
      col("dir") === col("cfg_dir") || col("dir").startsWith(concat(col("cfg_dir"), lit("/"))))
    // depth = prefix length (longer prefix = deeper dir = higher precedence)
    val withDepth = joined.withColumn("depth", length(col("cfg_dir")))
    // the file-specific layer only applies from the deepest config dir on the
    // path that contains a config file at all — max over ALL rows (default,
    // stem-scoped and sentinel alike), because the reference keeps
    // `scan_config_data` from the LAST scan_config.json read even when that
    // file has no "default" section (scan_config.py:75-82,113)
    val maxDepth = Window.partitionBy("doc_id")
    val scoped = withDepth
      .withColumn("max_depth", max(col("depth")).over(maxDepth))
      .where(col("scope") === "default" ||
        (col("scope") === col("stem") && col("depth") === col("max_depth")))
      .where(col("kind") =!= "sentinel") // presence markers contribute no keys
      // file-specific rows sort after every default row (they're applied
      // last). A stem that is LITERALLY "default" (a file named default.pdf)
      // selects the SAME config section as the default scope — the reference
      // applies that section twice, once as the default layer and once as
      // the file layer (scan_config.py get(stem) returns the same dict), so
      // list keys extend twice; emit BOTH layers for that row instead of
      // collapsing it into layer 0
      .withColumn("layer", explode(
        when(col("scope") =!= "default", array(lit(1)))
          .when(col("stem") === "default" && col("depth") === col("max_depth"),
            array(lit(0), lit(1)))
          .otherwise(array(lit(0)))))
    val lists = scoped.where(col("kind") === "list")
      .groupBy("doc_id", "key")
      .agg(array_join(transform(array_sort(collect_list(
        struct(col("layer"), col("depth"), col("ord"), col("value")))), x => x("value")), ",")
        .as("value"))
    val scalars = scoped.where(col("kind") === "scalar")
      .groupBy("doc_id", "key")
      .agg(max_by(col("value"), struct(col("layer"), col("depth"), col("ord"))).as("value"))
    lists.union(scalars)
  }
}
