package graft.pipeline

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

/** basis-style declarative pipeline: named nodes (data functions) wired
  * into a DAG by input references — the graph API a basis user writes in
  * `graph.yml` / the Python builder, mapped onto Spark's own lazy DAG:
  * resolving a node composes DataFrame transformations; Spark's scheduler
  * IS the graph runtime, so `produce` does no execution of its own.
  *
  * Block semantics: [[materialize]] writes a node's output as an immutable
  * parquet block directory and SKIPS recomputation when the block already
  * exists (parquet `_SUCCESS` marker) — the exactly-once-per-block /
  * incremental property basis tracks in its metadata DB, carried here by
  * the filesystem state itself.
  */
final class Pipeline {

  private case class Node(
      name: String,
      deps: Seq[String],
      fn: (SparkSession, Map[String, DataFrame]) => DataFrame)

  private val nodes = mutable.LinkedHashMap.empty[String, Node]

  /** A source node: no inputs, reads external storage. */
  def source(name: String)(fn: SparkSession => DataFrame): Pipeline =
    add(Node(name, Seq.empty, (s, _) => fn(s)))

  /** A transform node over one or more upstream nodes. */
  def node(name: String, deps: String*)(fn: Map[String, DataFrame] => DataFrame): Pipeline =
    add(Node(name, deps, (_, in) => fn(in)))

  private def add(n: Node): Pipeline = {
    require(!nodes.contains(n.name), s"duplicate node '${n.name}'")
    nodes.update(n.name, n)
    this
  }

  def nodeNames: Seq[String] = nodes.keys.toSeq

  /** Resolve `target`'s DataFrame, composing upstream nodes demand-driven
    * (basis `env.produce`). Each node resolves once per produce call;
    * cycles and missing deps are errors.
    */
  def produce(spark: SparkSession, target: String): DataFrame = {
    val resolved = mutable.Map.empty[String, DataFrame]
    val inProgress = mutable.Set.empty[String]
    def resolve(name: String): DataFrame = resolved.getOrElseUpdate(name, {
      val n = nodes.getOrElse(name,
        throw new IllegalArgumentException(s"unknown node '$name'"))
      require(inProgress.add(name), s"cycle through node '$name'")
      try n.fn(spark, n.deps.map(d => d -> resolve(d)).toMap)
      finally inProgress.remove(name)
    })
    resolve(target)
  }

  /** Materialize `target` as a parquet block at `dir/target`; if the block
    * already exists, return it without recomputing (incremental,
    * exactly-once-per-block). Returns the block as a DataFrame.
    */
  def materialize(spark: SparkSession, target: String, dir: String): DataFrame = {
    val path = s"$dir/$target"
    // Hadoop FS API, not java.io.File — the block dir may live on any
    // supported filesystem (hdfs://, s3a://, file:).
    val success = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    val fs = success.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(success)) {
      produce(spark, target).write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(path)
  }
}
