package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import java.net.URI

/** `file:` filesystem for graft sessions: LocalFileSystem (so
  * `FileSystem.getLocal` casts keep working) with client-side checksum
  * sidecars OFF and permission calls as no-ops.
  *
  * Why (measured, optimization round r18): without the Hadoop native
  * library, EVERY local file create pays `RawLocalFileSystem
  * .setPermission` → `Shell.execCommand` — a fork+exec of `chmod` per
  * file — and the default checksum wrapper doubles it by creating a
  * `.crc` sidecar per file (a second create, a second fork). jstack
  * sampling of the DML-protocol queries showed `Shell.runCommand`
  * under `LocalFSFileOutputStream.<init>` as the top RUNNABLE driver
  * frame after AQE waits. A snapshot commit creates data files +
  * manifest + segments (+ dv masks), so protocol entries paid dozens
  * of forks each, on the driver and in every write task.
  *
  * Both behaviours are pure local-mode artifacts: HDFS/S3/ABFS clients
  * neither fork processes for permissions nor write client-side `.crc`
  * sidecars. Scoping the override to the `file:` scheme (via
  * `spark.hadoop.fs.file.impl`, see [[graft.GraftSession]]) therefore
  * makes local execution MATCH production I/O behaviour; cluster
  * schemes are untouched. Restore Hadoop's default by setting
  * `spark.hadoop.fs.file.impl=org.apache.hadoop.fs.LocalFileSystem`.
  *
  * Permission semantics: created files keep the JVM's natural mode
  * (the process umask still applies at the OS level); graft never
  * reads or round-trips FS permissions.
  */
class FastLocalFileSystem
    extends LocalFileSystem(new FastRawLocalFileSystem) {
  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setWriteChecksum(false)
    setVerifyChecksum(false)
  }
}

/** The raw half: local FS whose permission calls never fork. */
class FastRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = ()

  // RawLocalFileSystem inherits FileSystem.getScheme's throw; callers
  // resolve the scheme for FS-kind dispatch, so answer it here
  override def getScheme: String = "file"
}
