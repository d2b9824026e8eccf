package graft.sources;

import java.io.IOException;

import org.apache.hadoop.fs.FileSystem;
import org.apache.hadoop.fs.Path;
import org.apache.hadoop.hive.ql.io.RCFile;
import org.apache.hadoop.hive.ql.io.RCFileOutputFormat;
import org.apache.hadoop.hive.serde2.columnar.BytesRefArrayWritable;
import org.apache.hadoop.io.WritableComparable;
import org.apache.hadoop.io.compress.CompressionCodec;
import org.apache.hadoop.io.compress.DefaultCodec;
import org.apache.hadoop.mapred.JobConf;
import org.apache.hadoop.mapred.RecordWriter;
import org.apache.hadoop.mapred.Reporter;
import org.apache.hadoop.util.Progressable;

/**
 * Hive's RCFileOutputFormat resolves its output file from the task work dir
 * that the MR framework sets during task setup — a key Spark's old-API
 * Hadoop bridge never sets, so its getRecordWriter NPEs. This subclass
 * resolves the file through FileOutputFormat.getTaskOutputPath (the
 * committer-aware path every stock old-API format uses), keeping the normal
 * attempt-dir + commit-rename protocol intact. Java because the parent's
 * raw-typed generics can't be overridden from Scala.
 */
public class TaskPathRCFileOutputFormat extends RCFileOutputFormat {
  @Override
  public RecordWriter<WritableComparable, BytesRefArrayWritable> getRecordWriter(
      FileSystem ignored, JobConf job, String name, Progressable progress)
      throws IOException {
    Path file = getTaskOutputPath(job, name);
    FileSystem fs = file.getFileSystem(job);
    // honor mapred compress-output settings like the stock format does
    CompressionCodec codec = null;
    if (getCompressOutput(job)) {
      Class<? extends CompressionCodec> codecClass =
          getOutputCompressorClass(job, DefaultCodec.class);
      codec = org.apache.hadoop.util.ReflectionUtils.newInstance(codecClass, job);
    }
    final RCFile.Writer out = new RCFile.Writer(fs, job, file, progress, codec);
    return new RecordWriter<WritableComparable, BytesRefArrayWritable>() {
      @Override
      public void write(WritableComparable key, BytesRefArrayWritable value)
          throws IOException {
        out.append(value);
      }

      @Override
      public void close(Reporter reporter) throws IOException {
        out.close();
      }
    };
  }
}
