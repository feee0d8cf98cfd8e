package metl;

import java.io.IOException;
import java.net.URI;
import org.apache.hadoop.fs.FileUtil;
import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.RawLocalFileSystem;

/**
 * A local filesystem that models OBJECT-STORE rename semantics: rename is
 * a non-atomic COPY of every byte followed by a delete of the source (the
 * S3/GCS behavior hidden behind Hadoop's FileSystem.rename contract), and
 * renaming onto an existing destination file fails instead of replacing
 * it. Registered under the "s3copy" scheme by the test fixture so fsutil
 * and the reliable-checkpoint path are exercised against these semantics
 * without a real object store in the sandbox.
 */
public class CopyRenameFileSystem extends RawLocalFileSystem {

  @Override
  public URI getUri() {
    return URI.create("s3copy:///");
  }

  @Override
  public boolean rename(Path src, Path dst) throws IOException {
    if (!exists(src)) {
      return false;
    }
    if (exists(dst) && getFileStatus(dst).isFile()) {
      // object stores do not atomically replace: surface the collision
      return false;
    }
    // copy EVERY byte, then delete the source -- O(data), non-atomic
    if (!FileUtil.copy(this, src, this, dst, false, true, getConf())) {
      return false;
    }
    return delete(src, true);
  }
}
