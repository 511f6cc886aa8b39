package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.sources.Filter

/** Commit versioning over the chunk grid — snapshot reads, rollback, and
  * retention for every write that goes through the connector/catalog
  * surface. The reference versions its FORMAT (`tokio-fs/src/lib.rs:59-63`
  * writes a version header per chunk and replaces whole chunks,
  * lib.rs:84-107) but keeps no commit history; a 100-TB table whose front
  * door is SQL DML needs "read the world as of commit N" and "undo that
  * backfill", so the staged-swap machinery every graft write already has is
  * generalized into a commit log:
  *
  *   - `_graft_versions/v<N>.manifest` — one line per LIVE data file
  *     (chunk-relative path) after commit N, maintained INCREMENTALLY:
  *     manifest(N) = manifest(N-1) − retired + added, so a commit's
  *     manifest cost is O(files it touched), never a grid walk — at a
  *     100k-chunk grid a walk per streaming epoch would be the commit
  *     cost. A fresh walk is used only where exact knowledge is missing:
  *     the first versioned commit's baseline, and commits that delegate to
  *     a World-level rewrite (upsert), which also HEAL any drift;
  *   - `_graft_history/v<N>/<relpath>` — files SUPERSEDED by commit N,
  *     moved (not deleted) out of the live tree. Underscore prefixes keep
  *     both invisible to the live read paths (the grid walk descends only
  *     `c<i>=<v>` directories; Spark's file index skips `_` paths).
  *
  * Snapshot resolution for a file of manifest K probes the history dirs of
  * versions > K in ascending order BEFORE the live tree: a file retired at
  * M (K < M) lives in exactly `_graft_history/v<M>/`, and probing history
  * first means a later same-named file in the live tree (task-id collisions
  * across Spark apps) can never shadow the snapshot's bytes.
  *
  * Scope: every connector/catalog commit versions (append, overwrite,
  * truncate, row-level COW, streaming epochs, metadata DELETE). The
  * programmatic World rewrites (insert / destroy / update / compact /
  * append / tryInsert) write through Spark's own parquet committer and are
  * VERSION BARRIERS: they delete superseded files outright, so older
  * snapshots may stop resolving (the resolver raises a clear error) and
  * `World.create`'s full overwrite resets the log entirely. Each barrier
  * drops a `_barrier` marker ([[noteBarrier]]) so the NEXT versioned
  * commit rebuilds its manifest from a walk instead of trusting a
  * predecessor the rewrite invalidated — without it an incremental
  * manifest after a barrier would silently misstate the commit's file set
  * (claiming files the rewrite deleted, missing files it wrote), which is
  * strictly worse than the resolver's loud missing-file error. Crash between a commit's file moves and its
  * manifest write leaves no manifest for that version — the version number
  * is reused by the next commit and older snapshots stay intact. Version
  * numbering rides the world's SINGLE-WRITER contract (the same one every
  * staged commit already relies on; the reference's worlds are
  * single-writer too): two simultaneous commits to one table would race on
  * the next version number, never corrupt data files.
  */
private[graft] object GraftVersions {
  private val VersionsDir = "_graft_versions"
  private val HistoryDir = "_graft_history"
  private val ManifestSuffix = ".manifest"
  private val ManifestHeader = "graft-manifest-v1"

  def manifestPath(root: Path, v: Long): Path =
    new Path(new Path(root, VersionsDir), s"v$v$ManifestSuffix")
  def historyPath(root: Path, v: Long): Path =
    new Path(new Path(root, HistoryDir), s"v$v")

  /** Chunk-relative form of a file under `root` (URI-path based — listStatus
    * returns fs-qualified paths whose raw string never prefix-matches). */
  def relOf(root: Path, file: Path): String =
    file.toUri.getPath.stripPrefix(root.toUri.getPath).stripPrefix("/")

  /** Versions with a committed manifest, ascending. */
  def listVersions(fs: FileSystem, root: Path): Seq[Long] = {
    val dir = new Path(root, VersionsDir)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.flatMap { s =>
      val n = s.getPath.getName
      if (n.startsWith("v") && n.endsWith(ManifestSuffix))
        scala.util.Try(n.stripPrefix("v").stripSuffix(ManifestSuffix).toLong).toOption
      else None
    }.sorted
  }

  def latestVersion(fs: FileSystem, root: Path): Option[Long] =
    listVersions(fs, root).lastOption

  /** Versions with retained history, ascending (superset info for probes —
    * a version may have a history dir but no manifest after a crash). */
  private def historyVersions(fs: FileSystem, root: Path): Seq[Long] = {
    val dir = new Path(root, HistoryDir)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.flatMap(s =>
      scala.util.Try(s.getPath.getName.stripPrefix("v").toLong).toOption).sorted
  }

  /** All live data files under the grid, chunk-relative. */
  def liveFiles(fs: FileSystem, root: Path): Seq[String] =
    if (!fs.exists(root)) Seq.empty
    else GraftDataSource.walkChunks(fs, root, Array.empty)
      .flatMap { case (d, _) => GraftDataSource.chunkFiles(fs, d) }
      .map(relOf(root, _))

  private def writeManifest(fs: FileSystem, root: Path, v: Long,
      files: Seq[String]): Unit = {
    val p = manifestPath(root, v)
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    out.write((s"$ManifestHeader $v\n" + files.sorted.mkString("\n") + "\n")
      .getBytes("UTF-8"))
    out.close()
  }

  def readManifest(fs: FileSystem, root: Path, v: Long): Seq[String] = {
    val p = manifestPath(root, v)
    if (!fs.exists(p)) {
      val have = listVersions(fs, root)
      throw new IllegalArgumentException(
        s"graft snapshot: no committed version $v under $root" +
          (if (have.isEmpty) " (the table has no versioned commits yet)"
           else s" (available: ${have.min}..${have.max}; gaps are crashed or " +
             "retention-expired commits)"))
    }
    val in = fs.open(p)
    val lines = new String(in.readAllBytes(), "UTF-8").split('\n')
    in.close()
    require(lines.nonEmpty && lines.head.startsWith(ManifestHeader),
      s"graft snapshot: $p is not a graft manifest")
    lines.drop(1).toSeq.filter(_.nonEmpty)
  }

  /** Start a versioned commit: the version this commit will write. A world
    * with data but no manifests first gets a BASELINE v0 manifest of its
    * pre-commit state, so the state a pre-versioning world was in when
    * versioning first touched it stays addressable. `excludeFromBaseline`:
    * chunk-relative files this commit itself already placed in the live
    * tree (plain appends write straight to the grid before commit()), which
    * therefore are not part of the pre-commit state. `baseline = false`
    * skips the v0 seal entirely — the BARRIER-delegating commits (upsert →
    * `World.insert`) must not promise a pre-state their own rewrite is
    * about to delete files out of. */
  def begin(fs: FileSystem, root: Path,
      excludeFromBaseline: Set[String] = Set.empty,
      baseline: Boolean = true): Long =
    latestVersion(fs, root) match {
      case Some(n) => n + 1
      case None =>
        if (baseline)
          writeManifest(fs, root, 0L,
            liveFiles(fs, root).filterNot(excludeFromBaseline.contains))
        1L
    }

  /** Move one superseded live data file into commit `v`'s history. */
  def retire(fs: FileSystem, root: Path, file: Path, v: Long): Unit = {
    val target = new Path(historyPath(root, v), relOf(root, file))
    fs.mkdirs(target.getParent)
    if (!fs.rename(file, target))
      throw new IllegalStateException(s"graft versions: failed to retire $file")
  }

  private def barrierPath(root: Path): Path =
    new Path(new Path(root, VersionsDir), "_barrier")

  /** Called by World-level rewrites (which bypass the commit log): the next
    * versioned commit must rebuild its manifest from a walk — see the
    * barrier discussion in the object doc. One empty-file touch. */
  def noteBarrier(fs: FileSystem, root: Path): Unit =
    if (fs.exists(new Path(root, VersionsDir))) {
      fs.create(barrierPath(root), true).close()
    } // a world with no version log yet has nothing to invalidate

  /** Is a World-rewrite barrier pending (manifests stale until the next
    * versioned commit heals them)? Streaming readers degrade to file-set
    * offsets while this holds. */
  def hasBarrier(fs: FileSystem, root: Path): Boolean =
    fs.exists(barrierPath(root))

  /** Seal commit `v` from a FULL WALK of the live tree — the healing form:
    * reflects every change on disk, including barrier rewrites, and clears
    * the barrier marker. Used for baselines and upsert-style commits whose
    * file set changed outside the commit's own knowledge. */
  def finish(fs: FileSystem, root: Path, v: Long): Unit = {
    writeManifest(fs, root, v, liveFiles(fs, root))
    fs.delete(barrierPath(root), false)
  }

  /** Seal commit `v` INCREMENTALLY: manifest(v) = predecessor − `removed` +
    * `added` (chunk-relative paths) — O(touched files), no walk. Falls back
    * to the walk-based [[finish]] when there is no predecessor manifest or
    * a World-level barrier invalidated it. */
  def finishIncremental(fs: FileSystem, root: Path, v: Long,
      removed: Set[String], added: Seq[String]): Unit = {
    val prev =
      if (fs.exists(barrierPath(root))) None
      else listVersions(fs, root).filter(_ < v).lastOption
        .map(readManifest(fs, root, _))
    prev match {
      case Some(p) =>
        writeManifest(fs, root, v,
          (p.filterNot(removed.contains) ++ added).distinct)
      case None => finish(fs, root, v)
    }
  }

  /** One walk over the retained history of versions in `versions`
    * (ascending): chunk-relative path -> physical location, keeping the
    * EARLIEST retiring version on collision (a rel name can reappear in a
    * later version's history after a rollback re-retire; the earliest is
    * the copy that was live before the first retire — see [[resolve]]).
    * O(retired files) listings, done ONCE per scan instead of per-file
    * existence probes across every history dir. */
  def historyIndex(fs: FileSystem, root: Path,
      versions: Seq[Long]): Map[String, Path] =
    versions.sorted.foldLeft(Map.empty[String, Path]) { (acc, m) =>
      val h = historyPath(root, m)
      if (!fs.exists(h)) acc
      else GraftDataSource.walkChunks(fs, h, Array.empty)
        .flatMap { case (d, _) => GraftDataSource.chunkFiles(fs, d) }
        .foldLeft(acc) { (a, f) =>
          val rel = relOf(h, f)
          if (a.contains(rel)) a else a + (rel -> f)
        }
    }

  /** Physical location of one manifest-`v` file: the history index of
    * versions > v first (a file live at v is retired at most once, at the
    * earliest later version holding its name — probing history before the
    * live tree means a later same-named live file can never shadow the
    * snapshot's bytes), then the live tree. */
  def resolve(fs: FileSystem, root: Path, rel: String, v: Long,
      laterIndex: Map[String, Path]): Path =
    laterIndex.getOrElse(rel, {
      val live = new Path(root, rel)
      if (fs.exists(live)) live
      else throw new IllegalStateException(
        s"graft snapshot v$v: $rel is neither live nor in retained history — " +
          "expired by retention, or superseded by an unversioned World-level " +
          "rewrite (insert/destroy/update/compact are version barriers)")
    })

  /** Buckets of a chunk-relative path (`c0=3/c1=5/part-….parquet`). */
  def bucketsOf(rel: String): Map[String, Long] =
    rel.split('/').dropRight(1).toSeq.flatMap { seg =>
      seg.split("=", 2) match {
        case Array(k, v) if GraftDataSource.isBucket(k) => Some(k -> v.toLong)
        case _ => None
      }
    }.toMap

  /** The files of snapshot `v` surviving the pushed bucket filters, resolved
    * to their current physical locations. One manifest read + one walk of
    * the later history dirs (typically small: only retired files live
    * there); no per-file existence probing against each history version. */
  def snapshotFiles(fs: FileSystem, root: Path, v: Long,
      pushed: Array[Filter]): Seq[(Path, Map[String, Long])] =
    resolveRels(fs, root, readManifest(fs, root, v), v, pushed)

  /** The files present in version `target` but NOT in version `base` —
    * one side of a chunk-granular CHANGE FEED. Under the engine's
    * copy-on-write (the replace unit is the chunk), the manifest diff IS
    * the change set: no row-level tracking exists or is needed, and a
    * consumer doing incremental recompute wants exactly "which cells
    * changed" anyway. Resolved at `target` (those files were live then). */
  def diffFiles(fs: FileSystem, root: Path, base: Long, target: Long,
      pushed: Array[Filter]): Seq[(Path, Map[String, Long])] = {
    val baseSet = readManifest(fs, root, base).toSet
    resolveRels(fs, root,
      readManifest(fs, root, target).filterNot(baseSet.contains), target, pushed)
  }

  /** Manifest-`v` files NOT in `seenRels`, resolved at `v` — the streaming
    * source's batch body for a version-cursor end offset. With `seenRels` =
    * manifest(base) this is exactly [[diffFiles]]; the set form also serves
    * mixed-regime plans (file-set start, version end) during checkpoint
    * upgrades and barrier recoveries. */
  def newFilesSince(fs: FileSystem, root: Path, seenRels: Set[String],
      v: Long, pushed: Array[Filter]): Seq[(Path, Map[String, Long])] =
    resolveRels(fs, root,
      readManifest(fs, root, v).filterNot(seenRels.contains), v, pushed)

  private def resolveRels(fs: FileSystem, root: Path, rels: Seq[String],
      v: Long, pushed: Array[Filter]): Seq[(Path, Map[String, Long])] = {
    val later = historyIndex(fs, root, historyVersions(fs, root).filter(_ > v))
    rels.map(rel => (rel, bucketsOf(rel)))
      .filter { case (_, b) => pushed.forall(GraftDataSource.evalOnBuckets(_, b)) }
      .map { case (rel, b) => (resolve(fs, root, rel, v, later), b) }
  }

  /** Restore the table to the state of `target`: retire live files the
    * target lacks, move the target's retired files back into the live
    * tree, and seal the result as a NEW version (history is append-only —
    * the rolled-back states stay addressable). Returns the new version. */
  def rollback(fs: FileSystem, root: Path, target: Long): Long = {
    val latest = latestVersion(fs, root).getOrElse(
      throw new IllegalArgumentException(
        s"graft rollback: $root has no versioned commits"))
    val targetFiles = readManifest(fs, root, target).toSet
    val newV = latest + 1
    val live = liveFiles(fs, root)
    val emptiedDirs = scala.collection.mutable.Set[Path]()
    live.filterNot(targetFiles.contains).foreach { rel =>
      val f = new Path(root, rel)
      emptiedDirs += f.getParent
      retire(fs, root, f, newV)
    }
    // restore: same identity rule the snapshot resolver uses — a target
    // file retired at some M in (target, latest] lives in history, and the
    // HISTORY copy is authoritative even when a same-named file is live (a
    // later app can re-use part-<pid>-<tid>-<n> names; rel-path equality is
    // NOT file identity). The index's upper bound excludes newV's own
    // fresh retirees (all non-target files). A target rel absent from the
    // index was never retired, so the live copy IS the target's bytes.
    val later = historyIndex(fs, root,
      historyVersions(fs, root).filter(m => m > target && m <= latest))
    targetFiles.foreach { rel =>
      later.get(rel) match {
        case Some(src) =>
          val dst = new Path(root, rel)
          if (fs.exists(dst)) {
            // same-named live impostor: push it into newV's history so the
            // states that DID contain it stay addressable
            emptiedDirs += dst.getParent
            retire(fs, root, dst, newV)
          }
          fs.mkdirs(dst.getParent)
          if (!fs.rename(src, dst))
            throw new IllegalStateException(
              s"graft rollback: failed to restore $rel")
        case None =>
          if (!fs.exists(new Path(root, rel)))
            throw new IllegalStateException(
              s"graft rollback: $rel of version $target is neither live nor " +
                "in retained history — expired by retention, or superseded " +
                "by an unversioned World-level rewrite")
      }
    }
    // drop chunk dirs the retires emptied so the grid walk stays clean
    emptiedDirs.foreach { d =>
      if (fs.exists(d) && fs.listStatus(d).isEmpty) {
        fs.delete(d, false)
        GraftStage.pruneEmptyParents(fs, d, root)
      }
    }
    finish(fs, root, newV)
    newV
  }

  /** Retention: keep the newest `keep` manifests; drop older manifests and
    * every history dir at or below the oldest kept version (history v<M>
    * serves only snapshots K < M, all of which are being dropped). Returns
    * the number of expired manifests. */
  def expire(fs: FileSystem, root: Path, keep: Int): Long = {
    require(keep >= 1, "graft expire_versions: keep must be >= 1")
    val versions = listVersions(fs, root)
    if (versions.size <= keep) return 0L
    // TAGGED versions are retained past the keep window (the point of a
    // tag: "this state stays addressable"); keeping manifest T requires
    // keeping every history dir > T (any may hold T's retired files), so
    // history pruning floors at the OLDEST kept version, tagged or not.
    val keepSet = versions.takeRight(keep).toSet ++
      listTags(fs, root).map(_._2).filter(versions.contains)
    val floor = keepSet.min
    val dropped = versions.filterNot(keepSet.contains)
    dropped.foreach(v => fs.delete(manifestPath(root, v), false))
    historyVersions(fs, root).filter(_ <= floor)
      .foreach(v => fs.delete(historyPath(root, v), true))
    dropped.size.toLong
  }

  /** Live chunk files NO retained manifest references, older than
    * `olderThanMs` — the leak class crashed DRIVERS leave in the grid
    * itself: a task that moved its committed files into the live tree
    * before the driver died never got its manifest sealed, so the bytes
    * sit in cells forever, invisible to manifest-planned reads but billed
    * and walked (stage-dir debris has its own sweeper, clean_stages).
    * The age bound keeps an in-flight commit's just-moved files safe —
    * they enter the live tree moments before their manifest seals.
    * Refuses unversioned worlds (no commit log = no way to tell an orphan
    * from data) and barrier-pending worlds (manifests are stale until the
    * next walk-based seal; sweeping against them would delete legitimate
    * post-rewrite files). */
  def orphanFiles(fs: FileSystem, root: Path, olderThanMs: Long): Seq[Path] = {
    val versions = listVersions(fs, root)
    require(versions.nonEmpty,
      s"graft remove_orphans: $root has no version log — an unversioned " +
        "world has no commit record to distinguish orphans from data")
    require(!hasBarrier(fs, root),
      s"graft remove_orphans: $root has a pending rewrite barrier — its " +
        "manifests are stale until the next write seals a walk-based " +
        "version; sweep after that write")
    val referenced: Set[String] =
      versions.flatMap(v => readManifest(fs, root, v)).toSet
    val cutoff = System.currentTimeMillis() - olderThanMs
    GraftDataSource.walkChunks(fs, root, Array.empty)
      .flatMap { case (d, _) => GraftDataSource.chunkFileStatuses(fs, d) }
      .filter(st => st.getModificationTime < cutoff &&
        !referenced.contains(relOf(root, st.getPath)))
      .map(_.getPath)
  }

  // --- named version refs ("tags"): human-handles into the commit log,
  // stored as one tiny file each beside the manifests. A tag pins its
  // version against retention (see expire). Immutable states only — the
  // mutable-branch analog is just the live table.
  private val TagPrefix = "tag-"
  private val TagName = java.util.regex.Pattern.compile("[A-Za-z][A-Za-z0-9._-]*")
  private def tagPath(root: Path, name: String): Path =
    new Path(new Path(root, VersionsDir), s"$TagPrefix$name")

  def setTag(fs: FileSystem, root: Path, name: String, v: Long): Unit = {
    require(TagName.matcher(name).matches(),
      s"graft tag: name '$name' must match [A-Za-z][A-Za-z0-9._-]*")
    readManifest(fs, root, v) // tag only committed, retained versions
    val out = fs.create(tagPath(root, name), true)
    out.write(s"$v\n".getBytes("UTF-8"))
    out.close()
  }

  def readTag(fs: FileSystem, root: Path, name: String): Option[Long] = {
    val p = tagPath(root, name)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val s = new String(in.readAllBytes(), "UTF-8").trim
      in.close()
      Some(s.toLong)
    }
  }

  def listTags(fs: FileSystem, root: Path): Seq[(String, Long)] = {
    val dir = new Path(root, VersionsDir)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith(TagPrefix))
      .flatMap { s =>
        val n = s.getPath.getName.stripPrefix(TagPrefix)
        readTag(fs, root, n).map(n -> _)
      }.sortBy(_._1)
  }

  def dropTag(fs: FileSystem, root: Path, name: String): Boolean =
    fs.delete(tagPath(root, name), false)

  /** A VERSION AS OF / graft.snapshot operand: a commit number, or a tag
    * name resolved through the tag files. */
  def resolveVersion(fs: FileSystem, root: Path, spec: String): Long =
    try spec.toLong
    catch {
      case _: NumberFormatException =>
        readTag(fs, root, spec).getOrElse(throw new IllegalArgumentException(
          s"graft: '$spec' is neither a commit version nor a tag of $root " +
            s"(tags: ${listTags(fs, root).map(_._1).mkString(", ")})"))
    }
}

/** Chunk-granular CHANGE FEED between two committed versions — the
  * incremental-recompute primitive a large pipeline runs on ("which cells
  * changed since my last run?"). Computed purely from the commit log: the
  * manifest diff lists exactly the files each side gained, resolved
  * through the same history-first rule snapshot reads use, so no
  * row-level change tracking exists or is needed.
  *
  * Granularity contract: the engine's replace unit is the CHUNK (every
  * rewrite stages whole cells — the reference's `write_chunk` semantics),
  * so an UPDATE touching one row of a cell reports the cell's rows on
  * BOTH sides (its old file as `delete`, its replacement as `insert`).
  * That is the honest unit for incremental consumption over this layout:
  * a downstream job re-derives the changed cells and touches nothing
  * else. Row-exact deltas, when needed, are one `except`/join over the
  * two sides — which Spark then computes over only the changed cells.
  */
object GraftChanges {
  /** All rows added and removed between `base` and `target` (both
    * committed versions of the world at `path`), tagged by a
    * `_change_type` column (`insert` = rows of files present in `target`
    * only, `delete` = rows of files present in `base` only). Bucket
    * predicates on the result prune the pinned file lists exactly like
    * any other pinned read. */
  def between(spark: org.apache.spark.sql.SparkSession, path: String,
      base: Long, target: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.lit
    def side(b: Long, t: Long, tag: String) =
      spark.read.format("graft").option("graft.changes", s"$b,$t").load(path)
        .withColumn("_change_type", lit(tag))
    side(base, target, "insert").unionByName(side(target, base, "delete"))
  }

  /** ROW-LEVEL NET changes between two versions: [[between]] is
    * chunk-granular by the engine's replace-unit contract — a one-row
    * UPDATE surfaces its whole cell on both sides — so consumers that want
    * "only the rows that actually changed" take the MULTISET difference of
    * the two sides (`EXCEPT ALL` each way: one shuffle over the changed
    * cells only, duplicate rows preserved with correct multiplicity).
    * `delete` rows are true before-images that vanished; `insert` rows are
    * values that genuinely appeared. A row rewritten with identical values
    * cancels out entirely. */
  def netBetween(spark: org.apache.spark.sql.SparkSession, path: String,
      base: Long, target: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.lit
    val feed = between(spark, path, base, target)
    val ins = feed.where(feed("_change_type") === "insert").drop("_change_type")
    val del = feed.where(feed("_change_type") === "delete").drop("_change_type")
    ins.exceptAll(del).withColumn("_change_type", lit("insert"))
      .unionByName(del.exceptAll(ins).withColumn("_change_type", lit("delete")))
  }
}
