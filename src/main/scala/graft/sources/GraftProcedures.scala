package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._

/** The manifest store's MAINTENANCE surface as SQL stored procedures
  * (Spark 4's `ProcedureCatalog` / `CALL` statement — the shape Iceberg
  * ships its `rewrite_data_files`/`expire_snapshots` procedures in, and
  * the piece that makes the lakehouse operable from pure SQL):
  *
  * {{{
  *   CALL graft_cat.compact_deletes('/data/store')
  *   CALL graft_cat.compact_files('/data/store', 100000)
  *   CALL graft_cat.rewrite_manifests('/data/store')
  *   CALL graft_cat.vacuum_older_than('/data/store', 604800000)  -- 7 days
  *   CALL graft_cat.vacuum('/data/store')                        -- keep newest
  *   CALL graft_cat.clone('/data/store', '/data/branch')
  *   CALL graft_cat.history('/data/store')
  * }}}
  *
  * Every procedure routes onto the EXACT Scala maintenance call
  * ([[ManifestTable]]) — the SQL front end is a binding layer, never a
  * second implementation — and returns its outcome as rows (a
  * [[LocalScan]]), so `CALL` results compose with SQL like any query.
  * `SHOW PROCEDURES` / `DESCRIBE PROCEDURE` work off the same registry.
  */
private[sources] object GraftProcedures {

  private val OutInts2 = StructType(Seq(
    StructField("manifests_deleted", IntegerType, nullable = false),
    StructField("files_deleted", IntegerType, nullable = false)))
  private val OutVersion = StructType(Seq(
    StructField("version", IntegerType, nullable = false)))

  private def p(n: String, dt: DataType) = ProcedureParameter.in(n, dt).build()
  private def pDefault(n: String, dt: DataType, default: String) =
    ProcedureParameter.in(n, dt).defaultValue(default).build()

  private final case class OutScan(schema0: StructType, out: Seq[Seq[Any]])
      extends LocalScan {
    override def readSchema(): StructType = schema0
    override def rows(): Array[InternalRow] =
      out.map(r => InternalRow.fromSeq(r)).toArray
    override def description(): String = "graft-procedure-result"
  }

  private def proc(
      nm: String, desc: String,
      params: Seq[ProcedureParameter], outSchema: StructType)(
      run: InternalRow => Seq[Seq[Any]]): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = nm
      override def description(): String = desc
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = nm
          override def description(): String = desc
          override def parameters(): Array[ProcedureParameter] = params.toArray
          // maintenance mutates table state — never cache/reuse a CALL
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): util.Iterator[Scan] =
            util.List.of[Scan](OutScan(outSchema, run(input))).iterator()
        }
    }

  private def pathArg(input: InternalRow, i: Int): String = {
    val s = if (input.isNullAt(i)) null else input.getUTF8String(i).toString
    require(s != null && s.nonEmpty, "procedure path argument must be a non-empty string")
    s
  }

  val all: Map[String, UnboundProcedure] = Seq(
    proc("vacuum",
      "expire all but the newest keep_versions manifests and sweep unreferenced files",
      Seq(p("path", StringType), pDefault("keep_versions", IntegerType, "1")),
      OutInts2) { in =>
      val (m, f) = ManifestTable.vacuum(pathArg(in, 0), in.getInt(1))
      Seq(Seq[Any](m, f))
    },
    proc("vacuum_older_than",
      "age-based retention: expire versions committed more than older_than_ms ago (current never expires)",
      Seq(p("path", StringType), p("older_than_ms", LongType)),
      OutInts2) { in =>
      val (m, f) = ManifestTable.vacuumOlderThan(pathArg(in, 0), in.getLong(1))
      Seq(Seq[Any](m, f))
    },
    proc("compact_files",
      "bin-pack data files recording fewer than min_rows rows into target_partitions packed files",
      Seq(p("path", StringType), p("min_rows", LongType),
        pDefault("target_partitions", IntegerType, "1")),
      OutVersion) { in =>
      Seq(Seq[Any](ManifestTable.compactSmallFiles(
        SparkSession.active, pathArg(in, 0), in.getLong(1), in.getInt(2))))
    },
    proc("zorder",
      "OPTIMIZE ZORDER BY: truncating rewrite range-clustered on the Morton interleave of cols (comma list)",
      Seq(p("path", StringType), p("cols", StringType),
        pDefault("target_partitions", IntegerType, "16")),
      OutVersion) { in =>
      require(!in.isNullAt(1),
        "zorder: cols must be a non-null comma list of column names")
      val cols = in.getUTF8String(1).toString
        .split(',').map(_.trim).filter(_.nonEmpty).toSeq
      Seq(Seq[Any](ManifestTable.compactZOrder(
        SparkSession.active, pathArg(in, 0), cols, in.getInt(2))))
    },
    proc("rewrite_manifests",
      "fold accreted child manifests and loose lines into one child per partition (pure metadata, no data file touched)",
      Seq(p("path", StringType)),
      StructType(Seq(
        StructField("version", IntegerType, nullable = false),
        StructField("children_before", IntegerType, nullable = false),
        StructField("children_after", IntegerType, nullable = false)))) { in =>
      val (v, b, a) = ManifestTable.rewriteManifests(pathArg(in, 0))
      Seq(Seq[Any](v, b, a))
    },
    proc("compact_deletes",
      "fold merge-on-read delete entries into rewritten data files (one truncating version)",
      Seq(p("path", StringType)),
      OutVersion) { in =>
      Seq(Seq[Any](ManifestTable.compactDeletes(SparkSession.active, pathArg(in, 0))))
    },
    proc("clone",
      "zero-copy shallow clone: dst's manifest-1 lists src's current snapshot by hard link",
      Seq(p("src", StringType), p("dst", StringType)),
      OutVersion) { in =>
      Seq(Seq[Any](ManifestTable.cloneTable(pathArg(in, 0), pathArg(in, 1))))
    },
    proc("history",
      "DESCRIBE HISTORY: every retained version's physical shape, oldest first",
      Seq(p("path", StringType)),
      StructType(Seq(
        StructField("version", IntegerType, nullable = false),
        StructField("n_data_files", LongType, nullable = false),
        StructField("n_rows", LongType, nullable = false),
        StructField("n_delete_entries", LongType, nullable = false),
        StructField("bytes", LongType, nullable = false)))) { in =>
      ManifestTable.history(pathArg(in, 0)).map(v =>
        // Seq[Any]: a bare Seq would numeric-widen the Int version to
        // Long alongside the Long stats and break the declared schema
        Seq[Any](v.version, v.nDataFiles, v.nRows, v.nDeleteEntries, v.bytes))
    }
  ).map(u => u.name() -> u).toMap
}
