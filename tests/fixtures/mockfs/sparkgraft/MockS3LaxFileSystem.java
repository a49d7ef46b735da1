package sparkgraft;

import java.io.IOException;
import java.net.URI;
import org.apache.hadoop.fs.FSDataOutputStream;
import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.permission.FsPermission;
import org.apache.hadoop.util.Progressable;

/**
 * The `mocks3na://` scheme: an object store WITHOUT atomic
 * create-if-absent. Plain S3 PUT semantics predate conditional writes:
 * a PUT never fails because the key exists — two writers doing
 * "check-then-create" both succeed and the last one silently wins. This
 * FS models that by forcing overwrite=true on every create, so any
 * component that relies on `create(path, overwrite=false)` being an
 * atomic claim (the writer lock, the manifest fence) is provably broken
 * here — the contract test asserts VectorIndex fails fast on this
 * scheme unless a conditional_put hook (modelling S3 `If-None-Match`)
 * is supplied.
 */
public class MockS3LaxFileSystem extends MockS3FileSystem {
  @Override
  public String getScheme() {
    return "mocks3na";
  }

  @Override
  public URI getUri() {
    return URI.create("mocks3na:///");
  }

  // last-writer-wins PUT: the overwrite=false claim silently succeeds.
  // RawLocalFileSystem's exists-check lives in the non-permission
  // overload (the permission variant delegates to it), so both are
  // forced to overwrite=true.

  @Override
  public FSDataOutputStream create(
      Path f,
      boolean overwrite,
      int bufferSize,
      short replication,
      long blockSize,
      Progressable progress)
      throws IOException {
    return super.create(f, true, bufferSize, replication, blockSize, progress);
  }

  @Override
  public FSDataOutputStream create(
      Path f,
      FsPermission permission,
      boolean overwrite,
      int bufferSize,
      short replication,
      long blockSize,
      Progressable progress)
      throws IOException {
    return super.create(f, permission, true, bufferSize, replication, blockSize, progress);
  }
}
