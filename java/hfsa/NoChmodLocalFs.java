package hfsa;

import java.io.IOException;
import java.net.URI;
import java.net.URISyntaxException;

import org.apache.hadoop.conf.Configuration;
import org.apache.hadoop.fs.DelegateToFileSystem;

/**
 * AbstractFileSystem twin of {@link NoChmodRawLocalFileSystem} for the
 * FileContext API (fs.AbstractFileSystem.file.impl): Structured
 * Streaming's FileContextBasedCheckpointFileManager creates its
 * offset/commit WAL files through FileContext, which resolves the
 * file:// scheme separately from fs.file.impl — the same per-file chmod
 * fork appeared in its stacks. DelegateToFileSystem is the stock
 * adapter; no checksum layer (HDFS checkpoints have no client-side crc
 * either, and WAL files are single-run scratch).
 */
public class NoChmodLocalFs extends DelegateToFileSystem {
    NoChmodLocalFs(final URI theUri, final Configuration conf)
            throws IOException, URISyntaxException {
        super(theUri, new NoChmodRawLocalFileSystem(), conf, "file", false);
    }
}
