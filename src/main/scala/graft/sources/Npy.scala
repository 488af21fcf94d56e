package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, EOFException}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/**
 * Minimal NumPy `.npy` (format version 1.0) codec for 2-D float matrices —
 * the reference persists its similarity matrix in this format
 * (`/root/reference/propius/similarity.py:173-186` save,
 * `:199-206` load), and a migration FROM propius needs to read those
 * files once. Deliberately a one-off interchange codec, not a scale
 * path: `.npy` is a single contiguous buffer with no row groups, no
 * column pruning, no splittable blocks — parquet remains the engine's
 * matrix format (SURVEY §2.1 OP-04). Scope: C-order (non-Fortran)
 * `<f4`/`<f8` little-endian 2-D arrays, the shapes the reference writes.
 *
 * Layout (numpy/lib/format.py, public spec): magic `\x93NUMPY`, version
 * bytes, little-endian uint16 header length, then an ASCII Python-dict
 * literal padded with spaces to a 64-byte-aligned total and terminated
 * by `\n`, followed by the raw element buffer.
 */
object Npy {

  private val Magic: Array[Byte] =
    Array(0x93.toByte, 'N'.toByte, 'U'.toByte, 'M'.toByte, 'P'.toByte, 'Y'.toByte)

  /** Write a dense row-major (rows × cols) matrix as `<f4` (float32 —
    * the reference's compute dtype, `similarity.py:31`). */
  def write(spark: SparkSession, path: String, rows: Int, cols: Int,
            values: Array[Float]): Unit = {
    require(values.length.toLong == rows.toLong * cols,
      s"values length ${values.length} != $rows x $cols")
    val header = s"{'descr': '<f4', 'fortran_order': False, 'shape': ($rows, $cols), }"
    val unpadded = Magic.length + 2 + 2 + header.length + 1
    val pad = (64 - unpadded % 64) % 64
    val headerBytes = (header + " " * pad + "\n").getBytes(US_ASCII)
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = new BufferedOutputStream(fs.create(p, true))
    try {
      out.write(Magic)
      out.write(1); out.write(0) // format version 1.0
      out.write(headerBytes.length & 0xff); out.write((headerBytes.length >> 8) & 0xff)
      out.write(headerBytes)
      val buf = ByteBuffer.allocate(4 * cols).order(ByteOrder.LITTLE_ENDIAN)
      var r = 0
      while (r < rows) {
        buf.clear()
        var c = 0
        while (c < cols) { buf.putFloat(values(r * cols + c)); c += 1 }
        out.write(buf.array(), 0, 4 * cols)
        r += 1
      }
    } finally out.close()
  }

  /** Read a 2-D `<f4` or `<f8` C-order matrix: (rows, cols, row-major
    * values as Double). Rejects anything outside the supported scope
    * loudly rather than misreading it. */
  def read(spark: SparkSession, path: String): (Int, Int, Array[Double]) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = new DataInputStream(new BufferedInputStream(fs.open(p)))
    try {
      val magic = new Array[Byte](6)
      in.readFully(magic)
      require(magic.sameElements(Magic), s"$path is not a .npy file")
      val major = in.read(); val minor = in.read()
      require(minor == 0 && (major == 1 || major == 2), s"unsupported .npy version $major.$minor")
      val headerLen =
        if (major == 1) in.read() | (in.read() << 8)
        else in.read() | (in.read() << 8) | (in.read() << 16) | (in.read() << 24)
      val headerBytes = new Array[Byte](headerLen)
      in.readFully(headerBytes)
      val header = new String(headerBytes, US_ASCII)
      def field(re: scala.util.matching.Regex, what: String): String =
        re.findFirstMatchIn(header).map(_.group(1))
          .getOrElse(throw new IllegalArgumentException(s"cannot parse $what in: $header"))
      val descr = field("'descr'\\s*:\\s*'([^']+)'".r, "descr")
      require(descr == "<f4" || descr == "<f8", s"unsupported dtype $descr (only <f4/<f8)")
      val fortran = field("'fortran_order'\\s*:\\s*(\\w+)".r, "fortran_order")
      require(fortran == "False", "Fortran-order .npy is not supported")
      val shape = field("'shape'\\s*:\\s*\\(([^)]*)\\)".r, "shape")
        .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt)
      require(shape.length == 2, s"expected a 2-D shape, got (${shape.mkString(",")})")
      val (rows, cols) = (shape(0), shape(1))
      val width = if (descr == "<f4") 4 else 8
      val n = rows.toLong * cols
      require(n <= Int.MaxValue / 2, s"matrix $rows x $cols too large for a driver-side read")
      val out = new Array[Double](n.toInt)
      val rowBuf = new Array[Byte](width * cols)
      var r = 0
      while (r < rows) {
        in.readFully(rowBuf)
        val bb = ByteBuffer.wrap(rowBuf).order(ByteOrder.LITTLE_ENDIAN)
        var c = 0
        while (c < cols) {
          out(r * cols + c) = if (width == 4) bb.getFloat(c * 4).toDouble else bb.getDouble(c * 8)
          c += 1
        }
        r += 1
      }
      if (in.read() != -1) throw new EOFException(s"$path holds more data than $rows x $cols")
      (rows, cols, out)
    } finally in.close()
  }
}
