package graft.fls

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Versioned TABLE METADATA log — the schema-evolution companion to
  * [[FlsManifest]]'s data-file log. One immutable JSON file per metadata
  * version under `_fls_table_log/v<N>` carries the table's DECLARED
  * schema (the full logical schema, partition columns included), its
  * partition columns, and free-form properties. `ALTER TABLE ADD COLUMN
  * / ALTER COLUMN TYPE` publish a new version with the same optimistic
  * CAS as manifest commits ([[FlsCas]]): metadata-only, O(1) in table
  * size, no data file is touched.
  *
  * Readers treat the newest metadata version as authoritative: a file
  * written before an ADD COLUMN simply lacks the column and serves NULLs
  * for it (the scan already reconciles per file by name — the same
  * machinery union_by_name uses); a file written before a type widening
  * stores the narrower type and widens at decode (the reader's fill and
  * zone maps already resolve types per file). The reference has no
  * schema evolution at all — its closest analog is the multi-file
  * promotion lattice (/root/reference/src/reader/schema_builder.cpp:
  * 132-172), which this log reuses as the legality rule for widenings
  * ([[Format.promote]]).
  *
  * Version files are JSON (UTF-8):
  * {{{
  * {"fls_table_meta": 1, "schema": <StructType.json>,
  *  "partition_by": ["dt"], "properties": {"k": "v"}}
  * }}} */
object FlsTableMeta {
  val LogDirName = "_fls_table_log"
  /** Headroom for readers planned just before a burst of ALTERs. */
  private val KeepVersions = 8
  private val MaxCasAttempts = 100

  /** Declared table metadata. `schema` is the FULL logical schema —
    * data columns first, partition columns (if any) last, Spark
    * convention. */
  final case class Meta(schema: StructType, partitionBy: Seq[String],
      properties: Map[String, String]) {
    def dataSchema: StructType =
      StructType(schema.fields.filterNot(f => partitionBy.contains(f.name)))
  }

  def logDir(dir: Path): Path = new Path(dir, LogDirName)
  def versionPath(dir: Path, v: Long): Path =
    new Path(logDir(dir), FlsCas.versionName(v))

  /** Newest (version, meta), or None when the table carries no metadata
    * log (plain directory of fls files — schema inferred from footers
    * as always). */
  def read(fs: FileSystem, dir: Path): Option[(Long, Meta)] = {
    val versions =
      try fs.listStatus(logDir(dir)).iterator
        .flatMap(s => FlsCas.parseVersionName(s.getPath.getName))
        .toSeq
      catch { case _: java.io.FileNotFoundException => Nil }
    if (versions.isEmpty) None
    else {
      val v = versions.max
      Some((v, readFile(fs, versionPath(dir, v))))
    }
  }

  /** One PINNED metadata version — immutable, so a consistent snapshot
    * schema regardless of concurrent ALTERs (snapshot-schema time
    * travel). Throws FileNotFoundException when `v` was GC'd past the
    * retention window — callers fall back to the current schema. */
  def readVersion(fs: FileSystem, dir: Path, v: Long): Meta =
    readFile(fs, versionPath(dir, v))

  /** Publish a new metadata version with optimistic concurrency: read
    * the newest, apply `merge`, claim `v<N+1>` exclusively; on a lost
    * race re-read and retry. `merge` may throw to abort (e.g. an ALTER
    * whose precondition a concurrent ALTER invalidated). Returns the
    * published version. */
  def commit(fs: FileSystem, dir: Path, writeId: String,
      conf: org.apache.hadoop.conf.Configuration)(
      merge: Option[Meta] => Meta): Long = {
    var attempt = 0
    while (attempt < MaxCasAttempts) {
      val cur = read(fs, dir)
      val merged = merge(cur.map(_._2))
      val next = cur.map(_._1).getOrElse(0L) + 1
      fs.mkdirs(logDir(dir))
      val tmp = new Path(new Path(new Path(dir, "_temporary"), writeId),
        s"meta_${FlsCas.versionName(next)}")
      writeContent(fs, tmp, merged)
      val won =
        try FlsCas.publishExclusive(fs, tmp, versionPath(dir, next), conf)
        finally { try fs.delete(tmp, false) catch { case _: Throwable => () } }
      if (won) {
        // metadata versions follow the same per-table retention budget
        // as manifest versions (manifests stamp them — see #schema)
        FlsCas.gcOldVersions(fs, logDir(dir), next,
          math.max(KeepVersions, FlsManifest.keepOf(Some(merged))))
        return next
      }
      attempt += 1
    }
    throw new java.io.IOException(
      s"fls table meta commit: lost the publish race $MaxCasAttempts times at $dir — giving up")
  }

  private def writeContent(fs: FileSystem, p: Path, m: Meta): Unit = {
    val obj = JObject(List(
      "fls_table_meta" -> JInt(1),
      "schema" -> JsonMethods.parse(m.schema.json),
      "partition_by" -> JArray(m.partitionBy.map(JString(_)).toList),
      "properties" -> JObject(m.properties.toList.sortBy(_._1)
        .map { case (k, v) => k -> (JString(v): JValue) })))
    val out = fs.create(p, true)
    try out.write(JsonMethods.compact(JsonMethods.render(obj))
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readFile(fs: FileSystem, p: Path): Meta = {
    val st = fs.getFileStatus(p)
    val buf = new Array[Byte](st.getLen.toInt)
    val in = fs.open(p)
    try in.readFully(0, buf) finally in.close()
    val j = JsonMethods.parse(new String(buf, StandardCharsets.UTF_8))
    require((j \ "fls_table_meta") == JInt(1),
      s"fls: unsupported table metadata version at $p")
    val schema = DataType.fromJson(
      JsonMethods.compact(JsonMethods.render(j \ "schema"))) match {
      case s: StructType => s
      case other => throw new IllegalStateException(
        s"fls: table metadata schema at $p is ${other.simpleString}, not a struct")
    }
    val partitionBy = (j \ "partition_by") match {
      case JArray(xs) => xs.map { case JString(s) => s; case other =>
        throw new IllegalStateException(s"fls: bad partition_by entry $other at $p") }
      case _ => Nil
    }
    val properties = (j \ "properties") match {
      case JObject(fields) => fields.map { case (k, JString(v)) => k -> v
        case (k, other) => k -> JsonMethods.compact(JsonMethods.render(other)) }.toMap
      case _ => Map.empty[String, String]
    }
    Meta(schema, partitionBy, properties)
  }

  /** Drop the metadata log (reverts the table to inferred-schema mode). */
  def delete(fs: FileSystem, dir: Path): Unit =
    try fs.delete(logDir(dir), true) catch { case _: Throwable => () }
}
