package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Per-document rejection ledger — the observability face of a curation
 * pipeline: funnel COUNTS (q149) tell you how much each stage costs;
 * when a specific document is missing from the training set, the
 * question is WHICH stage dropped it and nothing aggregates answer
 * that. The ledger assigns every input document its FIRST rejecting
 * stage in declared pipeline order (or 'kept'), matching how a real
 * pipeline short-circuits: a too-short page never reaches the dedup
 * pass, so its verdict is the length gate even if it is also a
 * duplicate.
 *
 * Stages arrive as (name, rejected-ids frame) in pipeline order — the
 * operator composes ANY gates (rule batteries, dedup tiers,
 * decontamination, classifier thresholds) without knowing their
 * internals. Shape: one union of id+priority rows (ids only, never
 * text), one min-priority aggregate, one left join back onto the id
 * spine — a single exchange family keyed on the id.
 *
 * Output: (idCol, verdict) — one row per input document.
 */
object CurationLedger {

  def rejectionLedger(docs: DataFrame, stages: Seq[(String, DataFrame)],
                      idCol: String = "doc_id"): DataFrame = {
    require(stages.nonEmpty, "rejectionLedger: declare at least one stage")
    require(stages.map(_._1).distinct.length == stages.length,
      "rejectionLedger: stage names must be unique")
    val rejections = stages.zipWithIndex.map { case ((_, ids), i) =>
      ids.select(col(idCol), lit(i).as("pri"))
    }.reduce(_ unionByName _)
    val first = rejections.groupBy(col(idCol)).agg(min(col("pri")).as("pri"))
    val verdict = stages.map(_._1).zipWithIndex
      .foldLeft(lit("kept")) { case (acc, (nm, i)) =>
        when(col("pri") === i, lit(nm)).otherwise(acc)
      }
    docs.select(col(idCol)).join(first, Seq(idCol), "left")
      .select(col(idCol), verdict.as("verdict"))
  }
}
