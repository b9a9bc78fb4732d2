package pts.fs;

import org.apache.hadoop.fs.LocalFileSystem;

/**
 * Drop-in replacement for the default file:// FileSystem
 * (checksummed LocalFileSystem) backed by {@link NioRawLocalFileSystem}
 * -- identical semantics (including .crc sidecars), minus the
 * chmod-subprocess fork per created file/dir. Wired up via
 * spark.hadoop.fs.file.impl in session.get_spark.
 */
public class NioLocalFileSystem extends LocalFileSystem {
  public NioLocalFileSystem() {
    super(new NioRawLocalFileSystem());
  }
}
