package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}

/** ONE atomic manifest across DERIVED stores — the cross-store
  * transaction-log step the round-10 verdict named (item 2): every
  * `Snapshot`-managed store commits its own versions independently,
  * so a pipeline that refreshes an inverted index AND its doc-length
  * view (RagPipeline), or a night's lake days AND their materialized
  * view (LakeOps), exposes a TORN window between the member commits —
  * a reader lands on the index fresh but the view stale, and BM25
  * scores against the wrong N/avgdl.
  *
  * The fix is the same shape as Snapshot itself, one level up: a
  * publish-set directory holds numbered manifests
  * (`_pub_v<N>.list`, lines `name=version`) naming each member
  * store's committed snapshot version, made current by ONE atomic
  * step — the pointer rename (`_pub_current`, POSIX/HDFS/ABFS) or the
  * write-once marker PUT (`_pubcommit.<n>`, honoring the same
  * `Snapshot.MarkerCommitKey` object-store mode). Member stores keep
  * committing as they always did; those versions are simply not
  * PUBLISHED until the manifest lands. Readers resolve the manifest
  * first and read every member AT ITS PINNED VERSION, so the set of
  * stores moves all-or-nothing: a crash anywhere between member
  * refreshes leaves the previous manifest current and the previous
  * (consistent) pair served.
  *
  * Versions are never deleted here (manifests are bytes) — publish
  * history is itself time travel: `resolveAt(v)` reproduces any past
  * cross-store state whose member versions retention still holds.
  * RETENTION COUPLING is the one care the caller owes: member stores
  * vacuum with `keep = 2` by default, so publish at least once per
  * member refresh (the provided pipeline wrappers do) or raise the
  * member `keep` to cover the publish cadence.
  */
object PublishSet {

  private def pointer(dir: Path) = new Path(dir, "_pub_current")
  private def listFile(dir: Path, v: Long) = new Path(dir, s"_pub_v$v.list")
  private def markerFile(dir: Path, v: Long) = new Path(dir, s"_pubcommit.$v")
  private val MarkerRe = "_pubcommit\\.(\\d+)".r

  /** The current published version: max(markers ∪ pointer) — the two
    * commit modes interoperate exactly as in [[Snapshot]]. A manifest
    * file above this (a crashed publish's strand) is invisible. */
  def currentVersion(fs: FileSystem, dir: Path): Option[Long] = {
    if (!fs.exists(dir)) return None
    val markers: Seq[Long] =
      fs.listStatus(dir).map(_.getPath.getName).toSeq.collect {
        case MarkerRe(v) => v.toLong
      }
    val ptr: Seq[Long] =
      if (fs.exists(pointer(dir)))
        Seq(Snapshot.readSmall(fs, pointer(dir)).trim.toLong)
      else Nil
    (markers ++ ptr).maxOption
  }

  /** Publish `members` (store name → committed snapshot version) as
    * the next manifest version. The manifest is written FIRST, the
    * pointer/marker LAST — a crash in between strands only an
    * unreferenced list file, overwritten by the next attempt at the
    * same version number. Returns the published version. */
  def publish(fs: FileSystem, conf: Configuration, dir: Path,
      members: Map[String, Long]): Long = {
    require(members.nonEmpty, "PublishSet.publish: empty member set")
    require(members.keys.forall(k => !k.contains('\n') && k.nonEmpty),
      s"PublishSet member names must be non-empty single lines: ${members.keys}")
    fs.mkdirs(dir)
    val next = currentVersion(fs, dir).getOrElse(0L) + 1L
    Snapshot.writeSmall(fs, listFile(dir, next),
      members.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k=$v" }.mkString("\n"))
    if (conf.getBoolean(Snapshot.MarkerCommitKey, false)) {
      Snapshot.writeSmall(fs, markerFile(dir, next), next.toString)
    } else {
      val tmp = new Path(dir, "_pub_current.tmp")
      Snapshot.writeSmall(fs, tmp, next.toString)
      val fc = FileContext.getFileContext(dir.toUri, conf)
      fc.rename(tmp, pointer(dir), Options.Rename.OVERWRITE)
    }
    next
  }

  /** The current published (store name → version) map, or None if
    * nothing was ever published. */
  def resolve(fs: FileSystem, dir: Path): Option[Map[String, Long]] =
    currentVersion(fs, dir).map(v => resolveAt(fs, dir, v))

  /** A specific publish version's member map — cross-store time
    * travel (valid while member retention holds those versions). */
  def resolveAt(fs: FileSystem, dir: Path, v: Long): Map[String, Long] =
    Snapshot.readSmall(fs, listFile(dir, v)).split("\n").map(_.trim)
      .filter(_.nonEmpty).map { line =>
        val i = line.lastIndexOf('=')
        require(i > 0, s"malformed publish manifest line: $line")
        line.substring(0, i) -> line.substring(i + 1).toLong
      }.toMap

  /** COMPOSED named tag over a published set — the durable form of
    * the retention coupling the scaladoc above leaves to the caller:
    * `resolveAt` reproduces a past cross-store state only WHILE
    * member vacuums still hold those versions. `tagPublished` pins
    * the CURRENT publish's member versions for real: it places a
    * `Snapshot.tag` named `pub.<name>` on every member store at its
    * pinned version (member vacuums then retain those manifests and
    * dirs indefinitely — the round-19 tag retention clause) and
    * records the publish version in `_pubtag.<name>`. Member tags
    * land BEFORE the pubtag file, so a crash mid-tag strands only
    * over-retention (re-running completes it; nothing is ever
    * under-pinned once the pubtag exists). `untagPublished` releases
    * in the reverse order. `storeDir` maps a manifest's member NAME
    * to its store directory — the pipeline wrapper owns that
    * mapping, exactly as it does for reads. */
  def tagPublished(fs: FileSystem, conf: Configuration, dir: Path,
      name: String, storeDir: String => Path): Long = {
    val v = currentVersion(fs, dir).getOrElse(
      throw new IllegalArgumentException(s"$dir has no published set"))
    resolveAt(fs, dir, v).foreach { case (member, mv) =>
      Snapshot.tag(fs, conf, storeDir(member), s"pub.$name", mv)
    }
    Snapshot.writeSmall(fs, new Path(dir, s"_pubtag.$name"), v.toString)
    v
  }

  /** The publish version a composed tag pins, or None. */
  def resolveTag(fs: FileSystem, dir: Path, name: String): Option[Long] = {
    val p = new Path(dir, s"_pubtag.$name")
    if (fs.exists(p)) Some(Snapshot.readSmall(fs, p).trim.toLong) else None
  }

  /** Release a composed tag: member tags first (their next vacuum
    * reclaims), the pubtag file last — the reverse of tagPublished,
    * so a crash mid-release leaves the pubtag visible and a re-run
    * completes it. */
  def untagPublished(fs: FileSystem, dir: Path, name: String,
      storeDir: String => Path): Unit = {
    resolveTag(fs, dir, name).foreach { v =>
      resolveAt(fs, dir, v).keys.foreach { member =>
        Snapshot.untag(fs, storeDir(member), s"pub.$name")
      }
      fs.delete(new Path(dir, s"_pubtag.$name"), false)
    }
  }
}
