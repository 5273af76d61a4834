package graft.sources

import java.util.{Iterator => JIterator}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.StructType

/** One graft-lake stored procedure (r14 — Spark 4's `ProcedureCatalog`
  * SPIP, the Iceberg `CALL` pattern): binds trivially (parameters are
  * declared up front), runs DRIVER-side against the catalog's
  * warehouse, and returns its result rows as one [[LocalScan]]. The
  * maintenance operations this surfaces (OPTIMIZE, ZORDER, VACUUM,
  * log expiry, checkpointing, constraints, protocol, history) are the
  * existing `LakeMaintenance`/`TxLog` entry points — the procedure
  * layer is pure wiring, same as the catalog. */
private[sources] final class LakeProcedure(name0: String,
    params: Seq[ProcedureParameter], outSchema: StructType,
    body: InternalRow => Seq[InternalRow])
    extends UnboundProcedure with BoundProcedure {

  override def name(): String = name0
  override def description(): String = s"graft-lake $name0"
  override def bind(inputType: StructType): BoundProcedure = this
  override def parameters(): Array[ProcedureParameter] = params.toArray
  override def isDeterministic: Boolean = false // side-effecting
  override def call(input: InternalRow): JIterator[Scan] = {
    val out = body(input).toArray
    val scan: Scan = new LocalScan {
      override def rows(): Array[InternalRow] = out
      override def readSchema(): StructType = outSchema
    }
    java.util.Collections.singletonList(scan).iterator()
  }
}

private[sources] object LakeProcedure {
  import org.apache.spark.sql.types._
  import org.apache.spark.unsafe.types.UTF8String

  private def s(v: String): UTF8String = UTF8String.fromString(v)
  private def row(vs: Any*): InternalRow =
    new GenericInternalRow(vs.toArray)
  private def out(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) =>
      StructField(n, t, nullable = true)
    })

  /** The `graft.system.*` procedure set, bound to one warehouse.
    * `rootOf` maps a `db.table` string through the catalog's
    * path-safe identifier rules. */
  def all(rootOf: String => String): Map[String, LakeProcedure] = {
    def spark: SparkSession = SparkSession.active
    def root(in: InternalRow): String =
      rootOf(in.getUTF8String(0).toString)

    Map(
      "optimize" -> new LakeProcedure("optimize",
        Seq(ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("target_rows", LongType).build(),
          ProcedureParameter.in("partition", StringType).defaultValue("NULL").build()),
        out("removed" -> LongType, "created" -> LongType,
          "version" -> LongType),
        in => {
          val part =
            if (in.isNullAt(2)) None
            else Some(in.getUTF8String(2).toString)
          val r = graft.operators.LakeMaintenance.compact(spark,
            root(in), in.getLong(1).toInt, part)
          Seq(row(r.removed.toLong, r.created.toLong, r.version))
        }),
      "zorder" -> new LakeProcedure("zorder",
        Seq(ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("cols", StringType).build(), // comma-separated
          ProcedureParameter.in("target_rows", LongType).build(),
          ProcedureParameter.in("stats_col", StringType).defaultValue("'doc_id'")
            .build()),
        out("removed" -> LongType, "created" -> LongType,
          "version" -> LongType),
        in => {
          val r = graft.operators.LakeMaintenance.zorder(spark,
            root(in),
            in.getUTF8String(1).toString.split(',').toSeq
              .map(_.trim).filter(_.nonEmpty),
            in.getLong(2).toInt,
            statsCol = in.getUTF8String(3).toString)
          Seq(row(r.removed.toLong, r.created.toLong, r.version))
        }),
      "vacuum" -> new LakeProcedure("vacuum",
        Seq(ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("retain_versions", LongType).build(),
          ProcedureParameter.in("grace_ms", LongType).defaultValue("600000").build()),
        out("deleted" -> LongType, "retained" -> LongType),
        in => {
          val r = graft.operators.LakeMaintenance.vacuum(root(in),
            in.getLong(1).toInt, in.getLong(2))
          Seq(row(r.deleted.toLong, r.retainedFiles.toLong))
        }),
      "expire_log" -> new LakeProcedure("expire_log",
        Seq(ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("keep_versions", LongType).build()),
        out("deleted_versions" -> LongType, "horizon" -> LongType),
        in => {
          val r = graft.operators.LakeMaintenance.expireLog(root(in),
            in.getLong(1).toInt)
          Seq(row(r.deletedVersions.toLong, r.horizon))
        }),
      "checkpoint" -> new LakeProcedure("checkpoint",
        Seq(ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("parts", LongType).defaultValue("1").build()),
        out("version" -> LongType),
        in => {
          val r = root(in)
          val v = graft.operators.TxLog
            .commitVersions(s"$r/log").max
          graft.operators.TxLog.writeCheckpoint(spark, s"$r/log",
            s"$r/ckpt", v, in.getLong(1).toInt)
          Seq(row(v))
        }),
      "describe_history" -> new LakeProcedure("describe_history",
        Seq(ProcedureParameter.in("table", StringType).build()),
        out("version" -> LongType, "op" -> StringType,
          "rows_added" -> LongType),
        in => graft.operators.TxLog.historyLocal(s"${root(in)}/log")
          .map { case (v, op, rows) =>
            row(v, op.map(s).orNull, rows)
          }),
      "add_constraint" -> new LakeProcedure("add_constraint",
        Seq(ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("name", StringType).build(),
          ProcedureParameter.in("expr", StringType).build()),
        out("version" -> LongType),
        in => Seq(row(LakeSource.addConstraint(spark, root(in),
          in.getUTF8String(1).toString,
          in.getUTF8String(2).toString)))),
      "drop_constraint" -> new LakeProcedure("drop_constraint",
        Seq(ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("name", StringType).build()),
        out("version" -> LongType),
        in => Seq(row(LakeSource.dropConstraint(root(in),
          in.getUTF8String(1).toString)))),
      "clone" -> new LakeProcedure("clone",
        Seq(ProcedureParameter.in("source", StringType).build(),
          ProcedureParameter.in("target", StringType).build()),
        out("source_version" -> LongType, "files" -> LongType,
          "version" -> LongType),
        in => {
          val r = graft.operators.LakeMaintenance.cloneTable(spark,
            root(in), rootOf(in.getUTF8String(1).toString))
          Seq(row(r.sourceVersion, r.files.toLong, r.version))
        }),
      "convert" -> new LakeProcedure("convert",
        Seq(ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("stats_col", StringType)
            .defaultValue("'doc_id'").build()),
        out("files" -> LongType, "rows" -> LongType,
          "version" -> LongType),
        in => {
          val r = graft.operators.LakeMaintenance.convert(spark,
            root(in), in.getUTF8String(1).toString)
          Seq(row(r.files.toLong, r.rows, r.version))
        }),
      "restore" -> new LakeProcedure("restore",
        Seq(ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("version", LongType)
            .defaultValue("NULL").build(),
          ProcedureParameter.in("timestamp", LongType)
            .defaultValue("NULL").build()),
        out("restored_version" -> LongType, "removed" -> LongType,
          "readded" -> LongType, "version" -> LongType),
        in => {
          val r = graft.operators.LakeMaintenance.restore(spark,
            root(in),
            version = if (in.isNullAt(1)) -1L else in.getLong(1),
            timestampMs = if (in.isNullAt(2)) -1L else in.getLong(2))
          Seq(row(r.restoredVersion, r.removed.toLong,
            r.readded.toLong, r.version))
        }),
      "upgrade_protocol" -> new LakeProcedure("upgrade_protocol",
        Seq(ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("min_reader", LongType).build(),
          ProcedureParameter.in("min_writer", LongType).build()),
        out("version" -> LongType),
        in => {
          val r = root(in)
          Seq(row(graft.operators.TxLog.upgradeProtocol(s"$r/log",
            s"$r/ckpt", in.getLong(1).toInt, in.getLong(2).toInt)))
        }))
  }
}
