package sparkgraft;

import java.net.URI;
import org.apache.hadoop.fs.RawLocalFileSystem;

/**
 * A Hadoop FileSystem registered under the non-file scheme `mocks3://`,
 * delegating storage to the local filesystem. Registering it via
 * `fs.mocks3.impl` makes every engine path-handling component (parquet
 * staging, VectorIndex maintenance, the writer lock's
 * create-if-absent) run through FileSystem.get(scheme) resolution and
 * scheme-qualified Paths exactly as it would against s3a:// or gs://:
 * the object-store contract test minus the network. What it does NOT
 * emulate: eventual listing consistency and non-atomic rename; the
 * production story for those is a cloud committer, documented in
 * Pipeline1Config.staging_dir.
 */
public class MockS3FileSystem extends RawLocalFileSystem {
  @Override
  public String getScheme() {
    return "mocks3";
  }

  @Override
  public URI getUri() {
    return URI.create("mocks3:///");
  }
}
