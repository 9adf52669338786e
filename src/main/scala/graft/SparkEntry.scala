package graft

import graft.cdc.Changelog
import graft.model.Mapping
import graft.pipeline.VectorPipeline
import graft.queries._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All declared queries (SURVEY.md §2.3). */
  def registry: Seq[Q] =
    GroupA.all ++ GroupB.all ++ GroupC.all ++ PipelineQueries.all ++
      QualityQueries.all ++ GroupE.all ++ GroupF.all ++ GroupG.all ++
      GroupH.all ++ GroupI.all ++ GroupJ.all ++ GroupK.all ++ GroupL.all ++
      GroupM.all ++ GroupN.all ++ GroupO.all ++ GroupP.all ++ GroupQ.all ++
      GroupR.all ++ GroupS.all ++ GroupT.all ++ GroupU.all ++ GroupV.all ++
      GroupW.all ++ GroupX.all ++ GroupY.all ++ GroupZ.all ++ GroupAA.all ++
      GroupAB.all ++ GroupAC.all ++ GroupAD.all ++ GroupAE.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's entire raison d'être as one DataFrame query: replay a
    * change log into the current vector store (CDC → latest-state → text →
    * embed → L2 normalize → vector points). */
  def entry(spark: SparkSession): DataFrame =
    VectorPipeline.vectorPoints(
      Changelog.changes(spark, "/root/testdata/sf0.001"),
      Mapping.documents)

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
