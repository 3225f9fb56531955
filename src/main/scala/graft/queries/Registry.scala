package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** All declared queries, keyed by name. SparkEntry delegates here. */
object Registry {
  def groups: Seq[QueryGroup] =
    Seq(CoreOps, Relational, Relational2, Relational3, Relational4,
      TimeWindows, StreamingQueries, NorthStar, NorthStar2, NorthStar3,
      NorthStar4, NorthStar5, NorthStar6, NorthStar7, NorthStar8,
      NorthStar9, NorthStar10, NorthStar11)

  lazy val all: Seq[Q] = {
    val qs = groups.flatMap(_.all)
    require(qs.map(_.name).distinct.size == qs.size, "duplicate query names")
    qs
  }

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  lazy val oracles: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql.linesIterator
      .map(_.trim).mkString(" "))).toMap
}
