package hfsa;

import java.io.IOException;

import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.RawLocalFileSystem;
import org.apache.hadoop.fs.permission.FsPermission;

/**
 * RawLocalFileSystem without the per-file chmod fork.
 *
 * Without libhadoop (NativeIO), Hadoop's RawLocalFileSystem implements
 * setPermission by forking a shell ("chmod ...") — once per created file
 * and directory. Thread-dump sampling of the benchmark put ~5% of
 * runnable task time in ProcessImpl.forkAndExec under
 * RawLocalFileSystem.setPermission (parquet data files, streaming WAL
 * and checkpoint files all pay it). On local[N] the JVM's umask already
 * yields the same effective modes for this single-user sandbox, so the
 * call is pure overhead; on a real cluster the data filesystem is
 * HDFS/S3 and this class is never in play (it is wired only for the
 * file:// scheme).
 *
 * Used directly as fs.file.impl (no ChecksumFileSystem wrapper), which
 * also removes the .crc shadow file per created file — halving local
 * file creates. Everything else inherits RawLocalFileSystem unchanged.
 */
public class NoChmodRawLocalFileSystem extends RawLocalFileSystem {
    @Override
    public void setPermission(Path p, FsPermission permission)
            throws IOException {
        // no-op: modes come from the process umask; avoids a fork per file
    }
}
