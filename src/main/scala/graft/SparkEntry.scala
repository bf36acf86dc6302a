package graft

import graft.queries.{AuditQueries, BehaviorQueries, BiQueries, ClusterEvalQueries, CommunityQueries, CoreQueries, CorrQueries, BootQueries, CrawlQueries, CurationQueries, CurriculumQueries, DupProfileQueries, IndexQueries, ElasticityQueries, EvalQueries, ExtendedQueries, GraphMetricsQueries, GrowthQueries, IoQueries, LoyaltyQueries, MediaQueries, MlQueries, NonparamQueries, OpsQueries, OutlierQueries, PipelineQueries, PrepQueries, DatacardQueries, QueryDef, ReadabilityQueries, RefineQueries, RetentionQueries, RetrievalQueries, RobustQueries, SemanticQueries, SeriesQueries, ShapeQueries, ShardQueries, StatQueries, StreamingQueries, SurvivalQueries, TrendQueries, TuneQueries, ZscoreQueries, WarehouseQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  def allQueries: Seq[QueryDef] =
    CoreQueries.all ++ PipelineQueries.all ++ ExtendedQueries.all ++
      StreamingQueries.all ++ CurationQueries.all ++ PrepQueries.all ++
      RefineQueries.all ++ SemanticQueries.all ++ WarehouseQueries.all ++
      AuditQueries.all ++ MlQueries.all ++ StatQueries.all ++
      TrendQueries.all ++ RetentionQueries.all ++ EvalQueries.all ++
      MediaQueries.all ++ RobustQueries.all ++ OpsQueries.all ++ IoQueries.all ++ BootQueries.all ++ SeriesQueries.all ++ BiQueries.all ++ TuneQueries.all ++ ShapeQueries.all ++ GrowthQueries.all ++ LoyaltyQueries.all ++ ElasticityQueries.all ++ ReadabilityQueries.all ++ OutlierQueries.all ++ SurvivalQueries.all ++ ShardQueries.all ++ ZscoreQueries.all ++ DupProfileQueries.all ++ CrawlQueries.all ++ IndexQueries.all ++ CurriculumQueries.all ++
      RetrievalQueries.all ++ DatacardQueries.all ++ BehaviorQueries.all ++
      ClusterEvalQueries.all ++ CommunityQueries.all ++ CorrQueries.all ++
      NonparamQueries.all ++ GraphMetricsQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("agg_q1")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
