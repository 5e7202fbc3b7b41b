package graft.fs

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local filesystem without the per-file `chmod` subprocess.
  *
  * Without the Hadoop native library (absent here — stock Spark
  * distribution, no libhadoop.so), `RawLocalFileSystem.setPermission`
  * shells out to `chmod` for EVERY file create and EVERY mkdir
  * (`Shell.runCommand` under `LocalFSFileOutputStream.<init>` and
  * `mkOneDirWithMode` — jstack-sampled during the r16-opt profiling
  * passes; it dominated write-task CPU). Measured on this host,
  * hadoop-client 3.4.2, 300 single-byte creates:
  *
  *   default LocalFileSystem                15.3 ms/file
  *   RawLocalFileSystem (no crc, chmod)      5.6 ms/file
  *   raw with setPermission no-op            0.14 ms/file
  *   LocalFileSystem over no-op raw          0.36 ms/file  <- this class
  *
  * A parquet commit creates several files (data + _SUCCESS + .crc
  * shadows + temporary attempt dirs), so a small snapshot commit paid
  * tens of forked subprocesses of pure overhead. This class keeps the
  * stock checksummed `LocalFileSystem` behavior in every respect
  * except one: permissions on created files/dirs are left at the
  * process umask instead of being re-applied via a forked `chmod` —
  * the same net permissions for a single-user engine, minus the fork.
  *
  * Installed through `core-site.xml` on the classpath
  * (`fs.file.impl`), so every SparkSession in any JVM carrying this
  * jar — Bench, Verify, GoldSuite, tests, probes — picks it up
  * without per-session configuration. Scale note: this is not a
  * local[32] bench tweak; any deployment writing to `file://`
  * (single-node, NFS scratch, container-local spill) pays the same
  * fork tax. Cluster object stores (s3a/abfs/hdfs) use their own
  * FileSystem impls and are untouched.
  */
final class NoChmodRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = ()
}

final class FastLocalFileSystem
  extends LocalFileSystem(new NoChmodRawLocalFileSystem)
