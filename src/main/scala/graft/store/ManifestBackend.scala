package graft.store

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** The storage primitives the manifest control plane actually needs —
  * the object-store port seam SURVEY §7.4.9 names. Everything above
  * this trait ([[Manifest]]'s CAS loop, snapshot reads, history, the
  * `latest` hint discipline) is storage-agnostic; everything rename- or
  * link-dependent lives in an implementation. Two are provided:
  *
  *  - [[LocalFsManifestBackend]] (default): the posix contract —
  *    `putIfAbsent` is write-temp + `link(2)` (EEXIST = lost race),
  *    exactly the primitive the warehouse-filesystem contract test
  *    pins.
  *  - [[InMemoryManifestBackend]]: a conditional-put ("if-none-match")
  *    key-value store — the S3/GCS commit primitive — proving the CAS
  *    loop, the hint discipline and the whole writer stack run
  *    unchanged on a backend with NO rename and NO link
  *    (RobustnessSpec drives both). A real object-store backend is this
  *    class with the map swapped for conditional PUTs.
  *
  * Scope: the MANIFEST only. The data plane needs no port — since the
  * rename-only protocol (r17), every data directory is written under a
  * uniquely named tentative path and taken by one atomic fail-if-exists
  * rename, which object stores express as copy-under-unique-prefix +
  * manifest-recorded paths (the manifest, not the directory listing, is
  * already the source of truth for readers).
  */
trait ManifestBackend {
  /** Version numbers present for this warehouse (any order). */
  def listVersions(warehouse: String): Vector[Long]

  /** The version's JSON, or None if it does not (or no longer) exists. */
  def read(warehouse: String, version: Long): Option[String]

  /** Cheap existence probe for one version. */
  def exists(warehouse: String, version: Long): Boolean

  /** Conditional put: publish `json` as `version` iff that version does
    * not exist — the commit primitive (link(2) locally, if-none-match
    * on an object store). False = lost the race, caller retries.
    */
  def putIfAbsent(warehouse: String, version: Long, json: String): Boolean

  /** Remove one version (history pruning). Racing readers are safe by
    * [[Manifest.current]]'s listing fallback.
    */
  def deleteVersion(warehouse: String, version: Long): Unit

  /** The `latest` version-pointer hint; 0 = absent. Only ever a LOWER
    * bound — readers walk forward from it.
    */
  def readHint(warehouse: String): Long

  /** Best-effort monotone advance of the hint; may silently no-op. */
  def writeHint(warehouse: String, version: Long): Unit

  /** An identity for the version's immutable content, used as the
    * parse-cache key — it must CHANGE when a warehouse is deleted and
    * recreated at the same path (version numbers restart). None = do
    * not cache (also the vanished-file signal).
    */
  def cacheKey(warehouse: String, version: Long): Option[AnyRef]

  /** File-identity heuristic for warehouses older than the minted
    * `created` UUID ([[Manifest.creationId]]); "" when the backend
    * cannot identify content that way (post-UUID warehouses never ask).
    */
  def creationId(warehouse: String): String
}

/** The posix-rename/link implementation — the default backend and the
  * one the warehouse-filesystem contract (SURVEY §7.4.9,
  * RobustnessSpec) pins.
  */
object LocalFsManifestBackend extends ManifestBackend {
  private def dir(warehouse: String): Path = Paths.get(warehouse, "_manifest")
  private def fileOf(warehouse: String, v: Long): Path =
    dir(warehouse).resolve(f"v$v%012d.json")

  private def versionOf(p: Path): Long =
    p.getFileName.toString.stripPrefix("v").stripSuffix(".json").toLong

  /** Manifest file paths, with the backing directory stream CLOSED
    * before returning. `Files.list` holds an open DirectoryStream that
    * full traversal does NOT release — only close() does — and version
    * discovery runs on Serve's per-GET hot path, so leaking one fd per
    * call kills a long-running server at the ulimit.
    */
  private def manifestFiles(d: Path): Vector[Path] = {
    val s = Files.list(d)
    try s.iterator().asScala
      .filter(_.getFileName.toString.matches("v\\d+\\.json")).toVector
    finally s.close()
  }

  def listVersions(warehouse: String): Vector[Long] = {
    val d = dir(warehouse)
    if (!Files.isDirectory(d)) Vector.empty
    else manifestFiles(d).map(versionOf)
  }

  def read(warehouse: String, version: Long): Option[String] =
    try Some(Files.readString(fileOf(warehouse, version)))
    catch { case _: java.io.IOException => None }

  def exists(warehouse: String, version: Long): Boolean =
    Files.exists(fileOf(warehouse, version))

  def putIfAbsent(warehouse: String, version: Long, json: String): Boolean = {
    val d = dir(warehouse)
    Files.createDirectories(d)
    val target = fileOf(warehouse, version)
    if (Files.exists(target)) return false
    val tmp = Files.createTempFile(d, ".tmp-manifest", ".json")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    try {
      // CAS primitive: link(2) fails with EEXIST if the target exists.
      // (NOT rename: POSIX rename silently REPLACES an existing target,
      // so racing committers would all "win" and share txids — caught by
      // the concurrent-PUT serve test.) The content is fully written to
      // tmp first, so the version appears atomically complete.
      Files.createLink(target, tmp)
      Files.deleteIfExists(tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException |
          _: java.nio.file.FileSystemException =>
        Files.deleteIfExists(tmp); false
    }
  }

  def deleteVersion(warehouse: String, version: Long): Unit = {
    Files.deleteIfExists(fileOf(warehouse, version))
    ()
  }

  private def hintPath(d: Path): Path = d.resolve("latest")

  def readHint(warehouse: String): Long =
    try {
      val s = Files.readString(hintPath(dir(warehouse))).trim
      if (s.matches("\\d+")) s.toLong else 0L
    } catch { case _: java.io.IOException => 0L }

  def writeHint(warehouse: String, version: Long): Unit =
    try {
      val d = dir(warehouse)
      if (readHint(warehouse) < version) {
        val tmp = Files.createTempFile(d, ".tmp-latest", "")
        try {
          Files.write(tmp, version.toString.getBytes(StandardCharsets.UTF_8))
          Files.move(tmp, hintPath(d), StandardCopyOption.REPLACE_EXISTING,
            StandardCopyOption.ATOMIC_MOVE)
        } finally Files.deleteIfExists(tmp) // no-op after a successful move
      }
    } catch { case _: java.io.IOException => () } // a hint may fail silently

  /** File identity (inode when exposed) + full-precision mtime + size:
    * a warehouse deleted and recreated at the same path restarts
    * version numbering, and a bare (warehouse, version) key would serve
    * the dead warehouse's state — size joins the key so a no-fileKey
    * filesystem with coarse mtimes still tells recreated same-version
    * states apart unless they also match byte-for-byte in length.
    */
  def cacheKey(warehouse: String, version: Long): Option[AnyRef] =
    try {
      val a = Files.readAttributes(fileOf(warehouse, version),
        classOf[java.nio.file.attribute.BasicFileAttributes])
      Some((Option(a.fileKey()).fold("")(_.toString), a.lastModifiedTime(),
        a.size()))
    } catch { case _: java.io.IOException => None }

  def creationId(warehouse: String): String = {
    val d = dir(warehouse)
    if (!Files.isDirectory(d)) return ""
    val files = manifestFiles(d)
    if (files.isEmpty) return ""
    try {
      val attrs = Files.readAttributes(files.minBy(versionOf),
        classOf[java.nio.file.attribute.BasicFileAttributes])
      // inode + birth time: an inode number can be recycled by a
      // recreation, but not with the same creation instant
      val k = attrs.fileKey()
      val born = attrs.creationTime.toMillis
      // both parts degenerate = this filesystem can't identify files;
      // "" tells the caller to fall back to conservative purging
      if (k == null && born <= 0L) ""
      else s"${if (k == null) "" else k.toString}@$born"
    } catch { case _: java.io.IOException => "" }
  }
}

/** A conditional-put key-value manifest store — the object-store commit
  * primitive (S3 `If-None-Match: *`, GCS `ifGenerationMatch=0`) proven
  * in memory: no rename, no link, no directory listing order, yet the
  * whole writer stack (claims, fused commits, folds, supersedes,
  * streaming cursors) runs unchanged on it. Data directories still live
  * on the filesystem — the manifest is the only rename-dependent
  * control-plane piece left (see [[ManifestBackend]]'s scope note).
  */
final class InMemoryManifestBackend extends ManifestBackend {
  private val store =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), String]()
  private val hints =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.atomic.AtomicLong]()

  def listVersions(warehouse: String): Vector[Long] =
    store.keySet().asScala.collect {
      case (w, v) if w == warehouse => v
    }.toVector

  def read(warehouse: String, version: Long): Option[String] =
    Option(store.get((warehouse, version)))

  def exists(warehouse: String, version: Long): Boolean =
    store.containsKey((warehouse, version))

  def putIfAbsent(warehouse: String, version: Long, json: String): Boolean =
    store.putIfAbsent((warehouse, version), json) == null

  def deleteVersion(warehouse: String, version: Long): Unit = {
    store.remove((warehouse, version))
    ()
  }

  def readHint(warehouse: String): Long =
    Option(hints.get(warehouse)).fold(0L)(_.get())

  def writeHint(warehouse: String, version: Long): Unit = {
    hints.computeIfAbsent(warehouse,
      _ => new java.util.concurrent.atomic.AtomicLong(0L))
      .accumulateAndGet(version, math.max)
    ()
  }

  /** Versions are immutable once put and this backend never outlives a
    * recreation (each test mounts a fresh instance), so caching by
    * (warehouse, version) alone would be sound — but None keeps the
    * test backend trivially correct: every read re-parses.
    */
  def cacheKey(warehouse: String, version: Long): Option[AnyRef] = None

  def creationId(warehouse: String): String = ""
}
