package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2.3 (query inventory) and §7.
  *
  * Every declared operator has BOTH a `queries` entry (the Spark plan) and —
  * when SQL-expressible — an `oracleSql` entry (the DuckDB-equivalent SQL the
  * driver hash-compares against at sf0.01). Determinism conventions are in
  * [[Determinism]] and FIXTURES.md §3.
  */
object SparkEntry {

  /** All declared queries, tier by tier (SURVEY.md §2.3). */
  def declared: Seq[Q] =
    operators.TierOne.all ++ operators.TierTwo.all ++
      operators.TierThree.all ++ operators.TierFour.all ++
      operators.TierFive.all ++ operators.TierSix.all ++
      operators.TierSeven.all ++ operators.TierEight.all ++
      operators.TierNine.all ++ operators.TierTen.all ++
      operators.TierEleven.all ++ operators.TierTwelve.all ++
      operators.TierThirteen.all ++ operators.TierFourteen.all ++
      operators.TierFifteen.all ++ operators.TierSixteen.all ++
      operators.TierSeventeen.all ++ operators.TierEighteen.all ++
      operators.TierNineteen.all ++ operators.TierTwenty.all ++
      operators.TierTwentyOne.all ++ operators.TierTwentyTwo.all ++
      operators.TierTwentyThree.all ++ operators.TierTwentyFour.all ++
      operators.TierTwentyFive.all ++ operators.TierTwentySix.all ++
      operators.TierTwentySeven.all ++ operators.TierTwentyEight.all ++
      operators.TierTwentyNine.all ++ operators.TierThirty.all ++
      operators.TierThirtyOne.all ++ operators.TierThirtyTwo.all ++
      operators.TierThirtyThree.all ++ operators.TierThirtyFour.all ++
      operators.TierThirtyFive.all ++ operators.TierThirtySix.all ++
      operators.TierThirtySeven.all ++ operators.TierThirtyEight.all ++
      operators.TierThirtyNine.all ++ operators.TierForty.all ++
      operators.TierFortyOne.all ++ operators.TierFortyTwo.all ++
      operators.TierFortyThree.all ++ operators.TierFortyFour.all ++
      operators.TierFortyFive.all ++ operators.TierFortySix.all ++
      operators.TierFortySeven.all ++ operators.TierFortyEight.all ++
      operators.TierFortyNine.all ++ operators.TierFifty.all ++
      operators.TierFiftyOne.all ++ operators.TierFiftyTwo.all ++
      operators.TierFiftyThree.all ++ operators.TierFiftyFour.all ++
      operators.TierFiftyFive.all ++ operators.TierFiftySix.all ++
      operators.TierFiftySeven.all ++ operators.TierFiftyEight.all ++
      operators.TierFiftyNine.all ++ operators.TierSixty.all ++
      operators.TierSixtyOne.all ++ operators.TierSixtyTwo.all ++
      operators.TierSixtyThree.all ++ operators.TierSixtyFour.all ++
      operators.TierSixtyFive.all ++ operators.TierSixtySix.all ++
      operators.TierSixtySeven.all ++ operators.TierSixtyEight.all ++
      operators.TierSixtyNine.all ++ operators.TierSeventy.all ++
      operators.TierSeventyOne.all ++ operators.TierSeventyTwo.all ++
      operators.TierSeventyThree.all ++ operators.TierSeventyFour.all ++
      operators.TierSeventyFive.all ++ operators.TierSeventySix.all ++
      operators.TierSeventySeven.all ++ operators.TierSeventyEight.all ++
      operators.TierSeventyNine.all ++ operators.TierEighty.all ++
      operators.TierEightyOne.all ++ operators.TierEightyTwo.all ++
      operators.TierEightyThree.all ++ operators.TierEightyFour.all ++
      operators.TierEightyFive.all ++ operators.TierEightySix.all ++
      operators.TierEightySeven.all ++ operators.TierEightyEight.all ++
      operators.TierEightyNine.all ++ operators.TierNinety.all ++
      operators.TierNinetyOne.all ++ operators.TierNinetyTwo.all ++
      operators.TierNinetyThree.all ++ operators.TierNinetyFour.all ++
      operators.TierNinetyFive.all ++ operators.TierNinetySix.all ++
      operators.TierNinetySeven.all ++ operators.TierNinetyEight.all ++
      operators.TierNinetyNine.all ++ operators.TierHundred.all ++
      operators.TierHundredOne.all ++ operators.TierHundredTwo.all ++
      operators.TierHundredThree.all ++ operators.TierHundredFour.all ++
      operators.TierHundredFive.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q07 exercises the spine of the reference: scan, projection, event-time
    * windowing, hash agg, analytic arg-max, deterministic output.
    */
  def entry(spark: SparkSession): DataFrame =
    operators.TierOne.q07.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    declared.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    declared.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
