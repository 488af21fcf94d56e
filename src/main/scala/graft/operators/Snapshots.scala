package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus snapshot diff — the audit face of incremental ingest: given two
 * snapshots of a document corpus, classify every id as added / removed /
 * changed / unchanged by CONTENT DIGEST, not by byte-comparing bodies.
 * This is the query a data-versioning layer answers before promoting a
 * new corpus build: what actually moved, and how much.
 *
 * Scale: each side reduces to (id, digest) map-side — the md5 runs
 * before any exchange, so only 16-byte digests shuffle, never document
 * bodies — then ONE co-partitioned full-outer hash join on the id.
 * No skew (ids are unique per side), no broadcast needed, linear in
 * corpus size.
 */
object Snapshots {

  /** (idCol, status) for every id in either snapshot;
    * status ∈ added | removed | changed | unchanged (relative to `base`).
    * Presence is carried by an explicit per-side flag, not the digest —
    * md5(NULL) is NULL, so a digest-as-presence test would classify a
    * present row with NULL text as absent. NULL text compares null-safely:
    * NULL→NULL is unchanged, NULL↔non-NULL is changed. */
  def diff(base: DataFrame, current: DataFrame,
           idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val b = base.select(col(idCol), md5(col(textCol)).as("__base_digest"),
      lit(true).as("__in_base"))
    val c = current.select(col(idCol), md5(col(textCol)).as("__cur_digest"),
      lit(true).as("__in_cur"))
    b.join(c, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__in_base").isNull, lit("added"))
          .when(col("__in_cur").isNull, lit("removed"))
          .when(!(col("__base_digest") <=> col("__cur_digest")), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }
}
