package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** The shared-build face registry — the production amortization made
  * measurable (VERDICT r12 #1).
  *
  * Every declared query stays oracle-self-contained in `Verify` (it
  * trains its own detector so its DuckDB oracle mirrors the whole
  * chain), but a production pipeline builds the shared working set ONCE
  * — [[Dedup.artifacts]] for the MinHash dedup-report family,
  * [[TierNineteen.celledArtifacts]] for the embedding near-dup-graph
  * family — and feeds every report from it. This registry maps each
  * consumer query name to its extracted face over a prebuilt handle;
  * `graft.Bench`'s shared-artifacts sweep times the build once per pass
  * (as its own `a0x_…` entries) and each consumer through its face, so
  * the benchmark measures the plans a production deployment runs.
  *
  * Equality is spec-pinned twice over: CelledArtifactsSpec /
  * DedupArtifactsSpec prove the handles' members ≡ their self-training
  * twins bit for bit, and BenchFacesSpec proves every face registered
  * HERE ≡ its declared query bit for bit.
  */
object SharedFaces {

  /** Consumers of the celled embedding near-dup quantizer
    * ([[TierNineteen.CelledArtifacts]]): one Lloyd training serves all
    * of them; each face re-runs only its own pair join + downstream.
    * q121 is deliberately ABSENT — it is the all-pairs recall anchor
    * the celled floor is measured against and must stay self-contained. */
  val celled: Seq[(String, (SparkSession, String, TierNineteen.CelledArtifacts) => DataFrame)] =
    Seq(
      "q122_split_leakage" -> (TierNineteen.q122Face _),
      "q124_contamination_report" -> (TierTwenty.q124Face _),
      "q128_trust_rank" -> (TierTwentyTwo.q128Face _),
      "q130_dup_graph_stats" -> (TierTwentyThree.q130Face _),
      "q136_seed_distance" -> (TierTwentySix.q136Face _),
      "q143_dup_core" -> (TierTwentyNine.q143Face _),
      "q144_drift_distance" -> (TierThirty.q144Face _),
      "q145_mutual_nn" -> (TierThirty.q145Face _),
      "q148_lpa_communities" -> (TierThirtyTwo.q148Face _),
      "q155_link_prediction" -> (TierThirtyFive.q155Face _),
      "q171_sim_histogram" -> (TierFortyThree.q171Face _),
      "q186_cluster_split" -> (TierFiftyOne.q186Face _),
      "q188_cluster_cohesion" -> (TierFiftyTwo.q188Face _),
      "q190_dup_concentration" -> (TierFiftyThree.q190Face _),
      "q240_erasure_audit" -> (TierEighty.q240Face _),
      "q250_threshold_sweep" -> (TierEightyFive.q250Face _))

  /** Consumers of the MinHash dedup-composition working set
    * ([[Dedup.Artifacts]]): pairs + cluster labels + classifier scores
    * built once, five reports read them (the faces [[Dedup]] already
    * exposes; DedupArtifactsSpec's inventory). */
  val dedup: Seq[(String, (SparkSession, String, Dedup.Artifacts) => DataFrame)] =
    Seq(
      "q55_dedup_clusters" -> ((s, dir, a) =>
        Dedup.clusterSizes(a)),
      "q158_leakage_matrix" -> ((s, dir, a) =>
        Dedup.leakageMatrix(Tables.load(s, dir, "documents"), a)),
      "q159_dedup_savings" -> ((s, dir, a) =>
        Dedup.savings(Tables.load(s, dir, "documents"), a)),
      "q165_best_of_cluster" -> ((s, dir, a) =>
        Dedup.bestOfCluster(a)),
      "q176_selection" -> ((s, dir, a) =>
        Dedup.budgetSelection(Tables.load(s, dir, "documents"), a, TierFortySix.Budget)),
      "q177_policy_diff" -> ((s, dir, a) =>
        Dedup.policyDiff(Tables.load(s, dir, "documents"), a)),
      "q280_cluster_purity" -> ((s, dir, a) =>
        Dedup.clusterPurity(Tables.load(s, dir, "documents"), a)),
      "q288_cluster_size_bands" -> ((s, dir, a) =>
        Dedup.sizeBands(a)))

  /** Consumers of the bigram-shingle working set
    * ([[TierHundredTwo.BigramArtifacts]], r15): the distinct
    * `(doc_id, shingle)` frame plus the rarest-first sorted-sid arrays
    * q28 and q284 both build, shingled once; q283/q290 read the shingle
    * frame alone. */
  val bigram: Seq[(String, (SparkSession, String, TierHundredTwo.BigramArtifacts) => DataFrame)] =
    Seq(
      "q28_ngram_jaccard" -> ((s, dir, a) =>
        TierFour.ngramJaccardOverArrs(a.arrs)._2),
      "q283_bigram_novelty" -> ((s, dir, a) =>
        TierHundredTwo.noveltyOver(a.sh)),
      "q284_containment_pairs" -> ((s, dir, a) =>
        TierHundredTwo.containmentOverArrs(a.arrs, num = 9, den = 10)),
      "q290_vocab_growth" -> ((s, dir, a) =>
        TierHundredFive.growthOver(a.sh.select(
          org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("shingle").as("token")))))
}
