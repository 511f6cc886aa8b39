package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, FSDataOutputStream,
  Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable
import org.scalatest.funsuite.AnyFunSuite
import java.net.URI
import java.nio.file.Files

/** A store with NO atomic primitive: it models the pre-conditional-PUT
  * object-store generation, where create-if-absent is check-then-act and
  * two writers can BOTH believe they created the file. The seam must
  * refuse to seal on it rather than silently race. */
class NonAtomicTestFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("noatomic:///")
}

/** Models a conditional-PUT object store faithfully enough for the
  * protocol: create(overwrite = false) performs ATOMIC arbitration on the
  * final key (exactly one concurrent writer wins; losers get
  * FileAlreadyExists — the `If-None-Match: *` precondition failure). */
class CondPutTestFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("condput:///")

  // exactly-one-winner arbitration on the final key, as If-None-Match does
  private def arbitrate(f: Path): Unit = {
    val local = pathToFile(f)
    local.getParentFile.mkdirs()
    if (!local.createNewFile())
      throw new FileAlreadyExistsException(f.toString)
  }

  // both create chains FileSystem.create(Path, boolean) can land on
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    if (!overwrite) {
      arbitrate(f)
      super.create(f, true, bufferSize, replication, blockSize, progress)
    } else super.create(f, overwrite, bufferSize, replication, blockSize,
      progress)

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    if (!overwrite) {
      arbitrate(f)
      super.create(f, permission, true, bufferSize, replication, blockSize,
        progress)
    } else super.create(f, permission, overwrite, bufferSize, replication,
      blockSize, progress)
}

/** The commit CAS's store capability seam: exclusive-create stores keep
  * the claim protocol, conditional-PUT stores publish in one request, and
  * stores with neither primitive refuse loudly instead of racing. */
class GraftCasStoreSpec extends AnyFunSuite {

  private def freshRoot(): Path =
    new Path(Files.createTempDirectory("graft-cas").toString)

  test("no-atomic-primitive store: the seal refuses loudly") {
    val fs = new NonAtomicTestFs
    fs.initialize(URI.create("noatomic:///"), new Configuration())
    val root = freshRoot()
    val e = intercept[UnsupportedOperationException] {
      GraftVersions.sealCommit(fs, root,
        GraftVersions.beginCommit(fs, root, baseline = false),
        Set.empty, Seq.empty)
    }
    assert(e.getMessage.contains("neither") &&
      e.getMessage.contains("graft.cas.assume-single-writer"),
      s"the refusal must name the remedy: ${e.getMessage}")
    assert(GraftVersions.listVersions(fs, root).isEmpty,
      "a refused seal must leave no manifest behind")
  }

  test("assume-single-writer unlocks the same store (safe without a CAS)") {
    val conf = new Configuration()
    conf.setBoolean(GraftVersions.AssumeSingleWriterKey, true)
    val fs = new NonAtomicTestFs
    fs.initialize(URI.create("noatomic:///"), conf)
    val root = freshRoot()
    val v = GraftVersions.sealCommit(fs, root,
      GraftVersions.beginCommit(fs, root, baseline = false),
      Set.empty, Seq.empty)
    assert(v == 1L && GraftVersions.listVersions(fs, root) == Seq(1L))
  }

  test("declared capability override beats the scheme default") {
    val conf = new Configuration()
    conf.set(GraftVersions.CapabilityConfPrefix + "noatomic",
      "create-exclusive")
    val fs = new NonAtomicTestFs
    fs.initialize(URI.create("noatomic:///"), conf)
    assert(GraftVersions.casCapability(fs, freshRoot()) ==
      GraftVersions.CreateExclusiveCap)
    val bad = new Configuration()
    bad.set(GraftVersions.CapabilityConfPrefix + "noatomic", "sometimes")
    val fsBad = new NonAtomicTestFs
    fsBad.initialize(URI.create("noatomic:///"), bad)
    intercept[IllegalArgumentException] {
      GraftVersions.casCapability(fsBad, freshRoot())
    }
  }

  test("conditional-put store: one request publishes; racing sealers serialize") {
    val conf = new Configuration()
    conf.set(GraftVersions.CapabilityConfPrefix + "condput", "conditional-put")
    val fs = new CondPutTestFs
    fs.initialize(URI.create("condput:///"), conf)
    val root = freshRoot()
    // seed the log so the racers contend on real successor versions
    GraftVersions.sealCommit(fs, root,
      GraftVersions.beginCommit(fs, root, baseline = false),
      Set.empty, Seq.empty)
    assert(!fs.exists(new Path(new Path(root, "_graft_versions"), "v1.claim")),
      "the conditional-put path must not create claim files")

    val writers = 8
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    val results = (0 until writers).map { i =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        override def call(): Long = {
          // an add-only commit: on a CAS loss the sealer re-begins from the
          // winner's state and replays — every writer must land eventually
          val rel = f"c0=0/part-race-$i%02d.parquet"
          val out = fs.create(new Path(root, rel), true)
          out.write(Array[Byte](1, 2, 3)); out.close()
          GraftVersions.sealCommit(fs, root,
            GraftVersions.beginCommit(fs, root,
              excludeFromBaseline = Set(rel)),
            Set.empty,
            Seq(GraftVersions.ManifestEntry(rel, 3L)))
        }
      })
    }
    pool.shutdown()
    val sealedVs = results.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    assert(sealedVs.toSet.size == writers,
      s"every writer sealed a DISTINCT version: $sealedVs")
    val versions = GraftVersions.listVersions(fs, root)
    assert(versions == (1L to (writers + 1L)),
      s"contiguous version chain, no gaps or double-seals: $versions")
    val finalRels = GraftVersions.readManifest(fs, root, versions.last).toSet
    assert((0 until writers).forall(i =>
      finalRels.contains(f"c0=0/part-race-$i%02d.parquet")),
      s"no writer's file was dropped by the race: $finalRels")
  }
}
