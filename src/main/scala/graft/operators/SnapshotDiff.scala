package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the dataset-versioning primitive: given two
  * snapshots of a corpus, classify every document as added / removed /
  * changed / unchanged. This is what an incremental pipeline runs
  * before deciding what to re-process (re-embed, re-dedup, re-ship):
  * the re-processing set is `added ∪ changed`, usually a tiny fraction
  * of the corpus.
  *
  * Change detection compares an md5 content digest, not the text
  * itself, so the join moves fixed-width digests instead of documents.
  * Scale shape: two digest projections + ONE full-outer join keyed by
  * the high-cardinality id (no skew, no broadcast of anything
  * corpus-sized); everything else is map-side.
  */
object SnapshotDiff {

  /** One row per id present in either snapshot:
    * (doc_id, change_type ∈ added|removed|changed|unchanged).
    *
    * Duplicate-id semantics (defined, not accidental): an id's content
    * is the MULTISET of its rows' texts — each side aggregates to one
    * digest-of-sorted-digests row per id, so duplicated ids join 1:1
    * (never a full-outer fan-out) and compare order-independently:
    * re-ordered duplicate rows are `unchanged`; any edit, addition, or
    * removal WITHIN an id's duplicate set is `changed`. The aggregate
    * keys on the same id as the join, so the partial-agg + join reuse
    * one shuffle partitioning. */
  def diff(prev: DataFrame, cur: DataFrame, idCol: String,
           textCol: String): DataFrame = {
    def digests(df: DataFrame, fpName: String) =
      df.select(col(idCol).as("doc_id"), md5(col(textCol)).as("fp0"))
        .groupBy(col("doc_id"))
        .agg(md5(concat_ws(",", sort_array(collect_list(col("fp0")))))
          .as(fpName))
    digests(prev, "fp_prev")
      .join(digests(cur, "fp_cur"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("fp_prev").isNull, "added")
          .when(col("fp_cur").isNull, "removed")
          .when(col("fp_prev") =!= col("fp_cur"), "changed")
          .otherwise("unchanged").as("change_type"))
  }
}
