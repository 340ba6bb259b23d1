package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The WRITE half of the DataSourceV2 contract — the seam `graft-synth`
  * demonstrates for reads (SURVEY §2.11). A 100 TB library's sinks live
  * or die on the commit protocol: tasks retry, executors die mid-write,
  * speculative duplicates race — and the table must still end up with
  * exactly one copy of every row. This sink implements the classic
  * two-phase file commit (the FileOutputCommitter-v1 shape every
  * Hadoop/Spark file sink descends from):
  *
  *   1. each task ATTEMPT writes to a private temp file under
  *      `path/_temp/<queryId>/` whose name carries (partition, task id)
  *      — attempts never share a file, so a failed or speculative
  *      attempt can be discarded without touching anyone else's output;
  *   2. `DataWriter.commit()` does NOT publish — it returns a
  *      [[FileSinkCommitMessage]] naming the temp file. Spark's commit
  *      coordinator guarantees at most one attempt per partition gets
  *      its message delivered to the driver;
  *   3. `BatchWrite.commit(messages)` — the only publisher — renames
  *      exactly the named temp files into `path/part-*.tsv`, then
  *      removes the whole `_temp/<queryId>` dir, sweeping every orphan
  *      a failed attempt left behind. `abort()` removes the temp dir
  *      without publishing anything.
  *
  * Rows only become visible through step 3, so task retry CANNOT
  * duplicate rows — pinned by SourcesSpec, which drives two attempts of
  * the same partition through the factory and shows one copy published
  * and zero temp residue.
  *
  * Truncate (`SaveMode.Overwrite` lowers to it via [[SupportsTruncate]])
  * deletes previously committed `part-*` files inside the SAME commit
  * step, after the new files are safely staged — the overwrite is
  * staged-then-swapped, never write-in-place.
  *
  * Two commit protocols, selected by `.option("commit", ...)`:
  *
  *   - `rename` (default) — the v1 shape above. Correct where rename is
  *     atomic (local fs, HDFS). Its publish loop is one move per file,
  *     so an IO failure MID-loop can tear: some part files visible, no
  *     `_SUCCESS`. The commit best-effort deletes what it already
  *     published before rethrowing, but a reader that ignores `_SUCCESS`
  *     during that window (or if the cleanup itself fails) can see a
  *     partial set — the documented residual of rename-commit, and the
  *     reason object stores need the second protocol.
  *   - `manifest` — the S3-safe shape (the Iceberg/Delta/S3A-magic
  *     commit idea reduced to one file): task output is PLACED under
  *     never-referenced `data-*` names, then visibility is a SINGLE
  *     atomic publish of a `_manifest` file listing exactly the visible
  *     data files. Readers list via the manifest
  *     ([[FileSinkManifest.visibleFiles]]), so a crash anywhere before
  *     the manifest write exposes NOTHING — placed-but-unreferenced
  *     files are inert garbage a later truncate publish sweeps. On a
  *     real object store the manifest publish is one atomic object PUT;
  *     locally it is simulated by write-temp-then-atomic-move of the
  *     one manifest file (one atomic step, not one per data file —
  *     that is the entire point).
  *
  * Deliberate demo bounds (documented, not hidden): paths are
  * local-filesystem `java.nio` operations — a cluster deployment swaps
  * them for Hadoop `FileSystem` calls against shared storage (same
  * protocol, same seam). Manifest mode is batch-only (streaming epochs
  * keep rename-commit + idempotence markers; requesting
  * `commit=manifest` on a streaming write fails loudly). The row codec
  * is TSV over scalar types — the protocol under test is commit, not
  * encoding.
  */
class FileSinkProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-filesink"
  // a pure sink has no schema of its own; ACCEPT_ANY_SCHEMA (the noop/
  // console-sink pattern) makes the write query's schema authoritative
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new FileSinkTable(new CaseInsensitiveStringMap(properties))
}

private[sources] class FileSinkTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsWrite {
  private val path = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graft-filesink requires a 'path' option")
    p
  }
  private val commitMode = {
    val m = Option(options.get("commit")).getOrElse("rename")
    require(m == "rename" || m == "manifest",
      s"graft-filesink 'commit' must be rename|manifest, got '$m'")
    m
  }
  override def name(): String = s"graft_filesink($path)"
  override def schema(): StructType = new StructType()
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE, TableCapability.ACCEPT_ANY_SCHEMA).asJava
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new FileSinkWriteBuilder(path, info, commitMode)
}

private[sources] class FileSinkWriteBuilder(path: String, info: LogicalWriteInfo,
    commitMode: String) extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      if (commitMode == "manifest")
        new FileSinkManifestBatchWrite(path, info.queryId(), info.schema(),
          doTruncate)
      else
        new FileSinkBatchWrite(path, info.queryId(), info.schema(), doTruncate)
    override def toStreaming: streaming.StreamingWrite = {
      // batch-only protocol: fail loudly rather than silently fall back
      if (commitMode == "manifest") throw new UnsupportedOperationException(
        "graft-filesink commit=manifest supports batch writes only; " +
        "streaming epochs use rename-commit with idempotence markers")
      new FileSinkStreamingWrite(path, info.queryId(), info.schema(), doTruncate)
    }
  }
}

final case class FileSinkCommitMessage(partitionId: Int, tempFile: String,
                                       rows: Long) extends WriterCommitMessage

private[graft] object FileSinkFs {
  /** Recursive delete (children before parents) — the one shared copy. */
  def deleteRecursively(t: Path): Unit =
    if (Files.exists(t)) {
      val s = Files.walk(t)
      try s.iterator().asScala.toSeq.sortBy(-_.getNameCount).foreach(Files.delete)
      finally s.close()
    }

  def list(dir: Path, prefix: String): Seq[Path] =
    if (!Files.exists(dir)) Nil
    else {
      val s = Files.list(dir)
      try s.iterator().asScala.toSeq
        .filter(_.getFileName.toString.startsWith(prefix))
      finally s.close()
    }
}

private[graft] class FileSinkBatchWrite(path: String, queryId: String,
    schema: StructType, truncate: Boolean) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new FileSinkWriterFactory(path, queryId, schema)

  /** The ONLY publisher: stage→publish under the driver's control. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    if (truncate) {
      FileSinkFs.list(dir, "part-").foreach(Files.delete)
      // a truncate resets the whole destination: stale epoch markers
      // from a previous streaming query in this path go too
      FileSinkFs.list(dir, "_epoch-").foreach(Files.delete)
    }
    // The publish loop is one rename per file — NOT atomic across files.
    // An IO failure mid-loop would otherwise leave a published subset
    // with no _SUCCESS (the torn window readers that skip the _SUCCESS
    // check would see). Best-effort: unpublish what this commit already
    // moved before rethrowing, shrinking that window to "cleanup itself
    // also failed". commit=manifest removes the window entirely.
    val published = scala.collection.mutable.ArrayBuffer.empty[Path]
    try messages.foreach { case FileSinkCommitMessage(pid, temp, _) =>
      val target = dir.resolve(f"part-$queryId-$pid%05d.tsv")
      Files.move(Paths.get(temp), target, StandardCopyOption.ATOMIC_MOVE)
      published += target
    } catch { case e: Throwable =>
      published.foreach(p =>
        try Files.deleteIfExists(p) catch { case _: Throwable => () })
      deleteTempDir()
      throw e
    }
    deleteTempDir() // sweeps every orphan attempt's file
    Files.write(dir.resolve("_SUCCESS"), Array.emptyByteArray)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    deleteTempDir() // nothing was published; remove all staged attempts

  private def deleteTempDir(): Unit = {
    FileSinkFs.deleteRecursively(Paths.get(path, "_temp", queryId))
    // drop the shared `_temp` parent once the last query's staging is
    // gone (concurrent writers to the same path each own a queryId
    // subdir, so a non-empty parent just stays)
    try Files.deleteIfExists(Paths.get(path, "_temp"))
    catch { case _: java.nio.file.DirectoryNotEmptyException => () }
  }
}

private[graft] class FileSinkWriterFactory(path: String, queryId: String,
    schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new FileSinkDataWriter(path, queryId, schema, partitionId, taskId)
}

/** The one-file commit ledger of manifest mode. The manifest IS the
  * table state: a data file exists iff the manifest names it. Publishing
  * a new manifest is the single atomic step every write reduces to —
  * locally a write-temp-then-atomic-move; on an object store, one PUT. */
private[graft] object FileSinkManifest {
  val Name = "_manifest"

  private val VersionRe = (Name + "-(\\d+)").r

  /** (version, manifest file) of the newest published manifest. The
    * manifest is VERSIONED (`_manifest-<n>`, zero-padded) so a publish
    * is a compare-and-swap on the version number, not a blind replace —
    * two concurrent appends that both read version n race to create
    * n+1, exactly one wins, and the loser re-reads (now seeing the
    * winner's files) and retries at n+2. The r8 advice named the
    * blind-replace form a lost-update: both appenders read the same
    * prev set and the second publish silently dropped the first's
    * files. A bare legacy `_manifest` (pre-versioning) reads as
    * version 0. */
  private def current(path: String): Option[(Long, Path)] = {
    val dir = Paths.get(path)
    if (!Files.exists(dir)) return None
    val versioned = FileSinkFs.list(dir, Name + "-").flatMap { p =>
      p.getFileName.toString match {
        case VersionRe(n) => Some((n.toLong, p))
        case _            => None
      }
    }
    if (versioned.nonEmpty) Some(versioned.maxBy(_._1))
    else {
      val legacy = dir.resolve(Name)
      if (Files.exists(legacy)) Some((0L, legacy)) else None
    }
  }

  def currentVersion(path: String): Long =
    current(path).map(_._1).getOrElse(0L)

  /** The committed view of `path`: the data files the newest manifest
    * lists (absolute), in manifest order. No manifest → no committed
    * data, whatever part/data files happen to sit in the directory. */
  def visibleFiles(path: String): Seq[Path] = current(path) match {
    case None => Nil
    case Some((_, m)) => Files.readAllLines(m, StandardCharsets.UTF_8)
      .asScala.toSeq.filter(_.nonEmpty).map(Paths.get(path, _))
  }

  /** Conditional publish: atomically create manifest version
    * `newVersion` listing exactly `names` — returns false (publishing
    * NOTHING) if that version already exists, i.e. another committer
    * won the race since the caller read [[currentVersion]]. The
    * create-if-absent is a hard link from a fully-written temp file
    * (`Files.createLink` fails with EEXIST atomically on POSIX);
    * readers can never observe a partially-written manifest. On an
    * object store the same protocol is a conditional PUT
    * (If-None-Match: *) of the versioned key — the primitive S3
    * exposes publicly — so the CAS shape survives the deployment this
    * mode exists for. Old versions are swept best-effort two behind
    * the head (a reader holding an open handle on POSIX is unaffected;
    * the newest version is never deleted). */
  def tryPublish(path: String, names: Seq[String], newVersion: Long): Boolean = {
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    val tmp = Files.createTempFile(dir, Name, ".tmp")
    Files.write(tmp,
      names.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    val target = dir.resolve(f"$Name-$newVersion%020d")
    val won =
      try { Files.createLink(target, tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    Files.deleteIfExists(tmp)
    if (won) {
      // GC behind the head: versions <= n-2 plus the legacy file
      FileSinkFs.list(dir, Name + "-").foreach { p =>
        p.getFileName.toString match {
          case VersionRe(n) if n.toLong <= newVersion - 2 =>
            try Files.deleteIfExists(p) catch { case _: Throwable => () }
          case _ => ()
        }
      }
      if (newVersion >= 2)
        try Files.deleteIfExists(dir.resolve(Name))
        catch { case _: Throwable => () }
    }
    won
  }
}

/** Manifest-commit batch write — the S3-safe protocol. Staging is
  * identical to rename-commit (private attempt files under `_temp`);
  * the difference is the publish step:
  *
  *   1. PLACE: each committed attempt's temp file moves to a
  *      `data-<queryId>-<pid>.tsv` name. These moves need no atomicity
  *      guarantee and no ordering — nothing references the names yet,
  *      so a crash after any prefix of them exposes nothing (pinned in
  *      SourcesSpec by a simulated torn placement).
  *   2. PUBLISH: ONE conditional manifest create (a CAS on the manifest
  *      version, [[FileSinkManifest.tryPublish]]) makes exactly this
  *      commit's file set (plus, for append, the files the head
  *      manifest listed) visible. A concurrent committer winning the
  *      version makes our read stale; the commit loop re-reads and
  *      retries, so concurrent appends to the same path linearize
  *      instead of losing updates. Truncate = publish a manifest
  *      listing only the new files; the old data files become
  *      unreferenced garbage and are best-effort swept after the
  *      publish. (A truncate RACING an append is an application-level
  *      conflict — the sweep may collect the append's placed-but-
  *      unpublished files, the same exposure any overwrite-vs-append
  *      race has; serialize overwrites against appenders.)
  *
  * A failed job's retry is a NEW write (fresh queryId): its placement
  * names cannot collide with the torn attempt's, and the torn garbage
  * stays invisible until a truncate publish sweeps it — so a retry after
  * a torn publish completes exactly-once by construction. */
private[graft] class FileSinkManifestBatchWrite(path: String, queryId: String,
    schema: StructType, truncate: Boolean) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new FileSinkWriterFactory(path, queryId, schema)

  /** Step 1 alone, exposed so the spec can simulate a commit that dies
    * between placement and publish. */
  private[graft] def place(messages: Array[WriterCommitMessage]): Seq[String] = {
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    messages.map { case FileSinkCommitMessage(pid, temp, _) =>
      val name = f"data-$queryId-$pid%05d.tsv"
      Files.move(Paths.get(temp), dir.resolve(name),
        StandardCopyOption.REPLACE_EXISTING)
      name
    }.toSeq
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = Paths.get(path)
    val placed = place(messages)
    // THE commit point, as a CAS loop: read the head version and its
    // file set, try to publish head+1; a concurrent committer winning
    // the version means OUR read was stale — re-read (now including the
    // winner's files) and retry, so no append ever drops another
    // append's files (the r8 lost-update advice)
    var live = Set.empty[String]
    var published = false
    while (!published) {
      val ver = FileSinkManifest.currentVersion(path)
      val prev =
        if (truncate) Nil
        else FileSinkManifest.visibleFiles(path).map(_.getFileName.toString)
      live = (prev ++ placed).toSet
      published = FileSinkManifest.tryPublish(path, prev ++ placed, ver + 1)
    }
    deleteTempDir()
    if (truncate) {
      // GC, after the publish: data files no manifest references —
      // the old generation plus any torn placements — are inert; sweep
      // them best-effort (a failure here cannot affect visibility)
      FileSinkFs.list(dir, "data-")
        .filterNot(p => live.contains(p.getFileName.toString))
        .foreach(p =>
          try Files.deleteIfExists(p) catch { case _: Throwable => () })
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    deleteTempDir()

  private def deleteTempDir(): Unit = {
    FileSinkFs.deleteRecursively(Paths.get(path, "_temp", queryId))
    try Files.deleteIfExists(Paths.get(path, "_temp"))
    catch { case _: java.nio.file.DirectoryNotEmptyException => () }
  }
}

/** The STREAMING write half: same staged two-phase protocol, one commit
  * per EPOCH (micro-batch), made IDEMPOTENT on the epoch id — after a
  * driver restart Structured Streaming replays the last un-checkpointed
  * micro-batch and re-commits the same epoch; a marker file makes the
  * second commit a no-op instead of a duplicate publish (the same
  * batch-id guard `foreachBatch` sinks keep in a table, kept here as a
  * filesystem marker because the sink IS the filesystem). A commit that
  * crashed MID-publish (files moved, marker not yet written) is healed
  * by the replay: no marker means the epoch's part files are swept
  * before this replay's complete set publishes, so a replay that plans
  * a different partition count cannot leave torn leftovers. Markers are
  * pruned to the latest epoch (only it can ever replay). Epoch staging
  * dirs are per-(query, epoch), so concurrent epochs of a restarted
  * query can never cross-contaminate.
  *
  * `truncate` is the COMPLETE output-mode contract (Spark lowers only
  * Complete through SupportsTruncate before toStreaming; Update would
  * additionally need SupportsStreamingUpdateAsAppend, which this sink
  * deliberately does not implement — riding update rows on the append
  * path would silently turn a snapshot sink into a change feed, so
  * update-mode queries fail at start instead): every epoch's
  * publish REPLACES the query's previous snapshot, so the epoch commit
  * sweeps ALL of this query's part files — prior epochs' snapshots
  * included — before publishing its own set. Without the sweep a
  * complete-mode query would accumulate one full snapshot per epoch,
  * silently duplicating the result. Append mode (`truncate = false`)
  * sweeps only its own epoch's torn leftovers, as before. */
private[graft] class FileSinkStreamingWrite(path: String, queryId: String,
    schema: StructType, truncate: Boolean = false)
    extends streaming.StreamingWrite {

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): streaming.StreamingDataWriterFactory =
    new FileSinkStreamingWriterFactory(path, queryId, schema)

  private def epochTemp(epochId: Long): Path =
    Paths.get(path, "_temp", s"$queryId-epoch-$epochId")
  private def marker(epochId: Long): Path =
    Paths.get(path, s"_epoch-$queryId-$epochId")

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    if (Files.exists(marker(epochId))) {
      // replayed epoch after a SUCCESSFUL commit: already published —
      // clean the re-staged attempts and do NOT publish twice
      deleteEpochTemp(epochId)
      return
    }
    // no marker: either the first commit of this epoch, or a replay
    // after a commit that CRASHED mid-publish. Self-heal: remove any
    // part files a torn commit left for this epoch (they may cover
    // partitions this replay no longer produces), then publish this
    // replay's complete set. The trailing '-' in the prefix keeps
    // epoch 1 from matching epoch 10. Under truncate (complete/update
    // mode) the sweep widens to the query's WHOLE previous snapshot —
    // this epoch replaces it.
    val stale =
      if (truncate) FileSinkFs.list(dir, s"part-$queryId-")
      else FileSinkFs.list(dir, s"part-$queryId-$epochId-")
    stale.foreach(Files.delete)
    messages.foreach { case FileSinkCommitMessage(pid, temp, _) =>
      Files.move(Paths.get(temp),
        dir.resolve(f"part-$queryId-$epochId-$pid%05d.tsv"),
        StandardCopyOption.ATOMIC_MOVE)
    }
    deleteEpochTemp(epochId)
    Files.write(marker(epochId), Array.emptyByteArray)
    // only the LATEST epoch can ever replay, so older markers are dead
    // weight — prune them instead of growing the dir one file per batch
    FileSinkFs.list(dir, s"_epoch-$queryId-")
      .filter(_ != marker(epochId)).foreach(Files.delete)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    deleteEpochTemp(epochId)

  private def deleteEpochTemp(epochId: Long): Unit =
    FileSinkFs.deleteRecursively(epochTemp(epochId))
}

private[graft] class FileSinkStreamingWriterFactory(path: String,
    queryId: String, schema: StructType)
    extends streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new FileSinkDataWriter(path, s"$queryId-epoch-$epochId", schema,
      partitionId, taskId)
}

/** One task ATTEMPT's writer. The temp file name carries the task id, so
  * concurrent attempts of the same partition (retry, speculation) write
  * disjoint files; only the attempt whose commit message reaches
  * `BatchWrite.commit` is ever published. */
private[graft] class FileSinkDataWriter(path: String, queryId: String,
    schema: StructType, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  private val tempFile = {
    val dir = Paths.get(path, "_temp", queryId)
    Files.createDirectories(dir)
    dir.resolve(f"attempt-$partitionId%05d-$taskId")
  }
  private val out = Files.newBufferedWriter(tempFile, StandardCharsets.UTF_8)
  private var count = 0L

  override def write(row: InternalRow): Unit = {
    val sb = new StringBuilder
    var i = 0
    while (i < schema.length) {
      if (i > 0) sb.append('\t')
      sb.append(cell(row, i, schema(i).dataType))
      i += 1
    }
    sb.append('\n')
    out.write(sb.toString)
    count += 1
  }

  private def cell(row: InternalRow, i: Int, dt: DataType): String =
    if (row.isNullAt(i)) "" else dt match {
      case LongType      => row.getLong(i).toString
      case IntegerType   => row.getInt(i).toString
      case DoubleType    => row.getDouble(i).toString
      case BooleanType   => row.getBoolean(i).toString
      case StringType    => row.getUTF8String(i).toString
      case DateType      => row.getInt(i).toString   // days since epoch
      case TimestampType => row.getLong(i).toString  // micros since epoch
      case other => throw new UnsupportedOperationException(
        s"graft-filesink demo codec does not serialize $other")
    }

  override def commit(): WriterCommitMessage = {
    out.close()
    FileSinkCommitMessage(partitionId, tempFile.toString, count)
  }

  override def abort(): Unit = {
    out.close()
    Files.deleteIfExists(tempFile) // best-effort; job commit sweeps the rest
  }

  override def close(): Unit = () // closed in commit/abort
}
