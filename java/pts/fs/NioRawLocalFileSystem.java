package pts.fs;

import java.io.IOException;
import java.nio.file.Files;
import java.nio.file.attribute.PosixFilePermission;
import java.util.EnumSet;
import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.RawLocalFileSystem;
import org.apache.hadoop.fs.permission.FsPermission;

/**
 * RawLocalFileSystem whose setPermission uses java.nio instead of
 * forking a chmod subprocess.
 *
 * Without the native hadoop library (libhadoop.so -- not shipped with
 * PySpark), Hadoop's RawLocalFileSystem falls back to
 * Shell.execCommand("chmod ...") for EVERY created file and directory.
 * Forking a multi-GB JVM costs ~20-40 ms, so a partitioned write that
 * creates a few thousand files spends several seconds in fork+exec
 * (measured: 1536-dir partitioned write 7.9 s -> 2.5 s with this
 * class). java.nio.Files.setPosixFilePermissions is the same chmod(2)
 * syscall without the subprocess.
 *
 * Sticky/setuid bits cannot be expressed via PosixFilePermission; they
 * never occur in Spark-created scratch/output trees (default
 * FsPermission masks are rwxrwxrwx minus umask), so this override
 * ignores them rather than re-introducing the shell path.
 */
public class NioRawLocalFileSystem extends RawLocalFileSystem {

  private static final PosixFilePermission[] BITS = {
    PosixFilePermission.OTHERS_EXECUTE,
    PosixFilePermission.OTHERS_WRITE,
    PosixFilePermission.OTHERS_READ,
    PosixFilePermission.GROUP_EXECUTE,
    PosixFilePermission.GROUP_WRITE,
    PosixFilePermission.GROUP_READ,
    PosixFilePermission.OWNER_EXECUTE,
    PosixFilePermission.OWNER_WRITE,
    PosixFilePermission.OWNER_READ,
  };

  private static EnumSet<PosixFilePermission> toPosix(short mode) {
    EnumSet<PosixFilePermission> s = EnumSet.noneOf(PosixFilePermission.class);
    for (int i = 0; i < 9; i++) {
      if (((mode >> i) & 1) == 1) {
        s.add(BITS[i]);
      }
    }
    return s;
  }

  @Override
  public void setPermission(Path p, FsPermission permission) throws IOException {
    if (permission == null) {
      return;
    }
    Files.setPosixFilePermissions(pathToFile(p).toPath(), toPosix(permission.toShort()));
  }
}
