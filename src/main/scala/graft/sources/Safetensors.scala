package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream,
  EOFException, FileInputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** safetensors export/ingest — the HF-ecosystem tensor container an
  * embedding corpus ships to trainers and vector stores as (the
  * `.npy` source's modern sibling; TfRecord carries examples, this
  * carries TENSORS). Everything here is the PUBLIC format
  * (github.com/huggingface/safetensors): a file is
  *
  *   u64-LE header_len ‖ header JSON (UTF-8) ‖ data buffer
  *
  * where the header maps tensor name → {"dtype", "shape",
  * "data_offsets": [begin, end)} with offsets into the data buffer
  * (contiguous, non-overlapping), plus an optional "__metadata__"
  * string map. Data is little-endian, C-order, no alignment padding
  * required. Vector tensors may be F32, F16, or BF16 (the trainer
  * dtypes — fp16/bf16 dominate shipped checkpoints); ids are I64.
  * Anything else throws on read rather than misparse. Half-precision
  * conversion is the IEEE-754 binary16 / bfloat16 arithmetic with
  * round-to-nearest-even — no JDK dependency (Float.float16ToFloat
  * arrived in Java 20; this build targets 17).
  *
  * Scale shape: write is one `.safetensors` file per partition — the
  * format's tensors are CONTIGUOUS, so a shard's header cannot be
  * written until its row count is known; the writer streams the data
  * section to a temp file at constant memory (never a whole-partition
  * array), then assembles header + data under a temp name and RENAMES
  * it into place (a task retry or speculative attempt must never
  * interleave bytes into the final path). Rows per partition is the
  * shard-size knob exactly as with every other export. Read is
  * file-level parallelism via binaryFiles with a streaming slice of
  * the two tensors; a header naming offsets beyond the file, a ragged
  * row, or an unknown dtype throws loudly (the TfRecord CRC doctrine:
  * silent truncation of a training shard is the corruption nothing
  * downstream catches).
  */
object Safetensors {

  private val mapper = new ObjectMapper

  /** Bytes per element of the supported vector dtypes. */
  private def vecBpe(dtype: String): Int = dtype match {
    case "F32" => 4
    case "F16" | "BF16" => 2
    case other => throw new IllegalArgumentException(
      s"unsupported safetensors vector dtype $other (F32, F16, BF16)")
  }

  /** float → IEEE-754 binary16 bits, round-to-nearest-even; overflow
    * to ±Inf, NaN kept NaN, subnormals rounded exactly. */
  private[graft] def floatToF16(f: Float): Short = {
    val bits = java.lang.Float.floatToIntBits(f)
    val sign = (bits >>> 16) & 0x8000
    val abs = bits & 0x7fffffff
    if (abs > 0x7f800000) (sign | 0x7e00).toShort // NaN
    else if (abs >= 0x47800000) (sign | 0x7c00).toShort // ≥ 2^16 → Inf
    else if (abs >= 0x38800000) {
      // normal half: rebias exp by -112, round 23-bit mantissa to 10
      val v = abs - 0x38000000
      val shifted = v >>> 13
      val rem = v & 0x1fff
      val up = if (rem > 0x1000 || (rem == 0x1000 && (shifted & 1) == 1)) 1 else 0
      (sign | (shifted + up)).toShort // mantissa carry rolls the exponent
    } else if (abs >= 0x33000000) {
      // subnormal half: value·2^24 rounded to the 10-bit field
      val exp = abs >>> 23
      val mant = (abs & 0x7fffff) | 0x800000
      val s = 126 - exp // 14..24
      val shifted = mant >>> s
      val half = 1 << (s - 1)
      val rem = mant & ((1 << s) - 1)
      val up = if (rem > half || (rem == half && (shifted & 1) == 1)) 1 else 0
      (sign | (shifted + up)).toShort
    } else sign.toShort // < 2^-25 → ±0
  }

  /** IEEE-754 binary16 bits → float (exact). */
  private[graft] def f16ToFloat(h: Short): Float = {
    val hi = h & 0xffff
    val sign = (hi & 0x8000) << 16
    val exp = (hi >>> 10) & 0x1f
    val mant = hi & 0x3ff
    val bits =
      if (exp == 0x1f) sign | 0x7f800000 | (mant << 13)
      else if (exp != 0) sign | ((exp + 112) << 23) | (mant << 13)
      else if (mant == 0) sign
      else { // subnormal: value = mant · 2^-24, normalize
        val p = 31 - Integer.numberOfLeadingZeros(mant)
        sign | ((p + 103) << 23) | ((mant << (23 - p)) & 0x7fffff)
      }
    java.lang.Float.intBitsToFloat(bits)
  }

  /** float → bfloat16 bits (top half of the float), round-to-nearest-
    * even; NaN quieted so the truncation cannot yield Inf. */
  private[graft] def floatToBf16(f: Float): Short = {
    val bits = java.lang.Float.floatToIntBits(f)
    if ((bits & 0x7fffffff) > 0x7f800000) ((bits >>> 16) | 0x0040).toShort
    else (((bits + 0x7fff + ((bits >>> 16) & 1)) >>> 16)).toShort
  }

  /** bfloat16 bits → float (exact: bf16 IS the float's top half). */
  private[graft] def bf16ToFloat(h: Short): Float =
    java.lang.Float.intBitsToFloat((h & 0xffff) << 16)

  /** Write `df`'s (idCol: LONG, vecCol: ARRAY<FLOAT>) as one
    * safetensors file per partition holding two tensors named after
    * the columns: I64 `[n]` ids and `dtype` `[n, dim]` vectors (row i
    * of each corresponds; `dtype` ∈ F32 | F16 | BF16 — the half
    * dtypes quantize with round-to-nearest-even). `dim` is taken from
    * the first row of each partition; a ragged or null row THROWS — a
    * tensor with silently skipped rows would desynchronize ids from
    * vectors. Empty partitions write nothing.
    */
  def write(df: DataFrame, dir: String, idCol: String, vecCol: String,
            dtype: String = "F32"): Unit = {
    val idIdx = df.schema.fieldIndex(idCol)
    val vecIdx = df.schema.fieldIndex(vecCol)
    val bpe = vecBpe(dtype)
    new java.io.File(dir).mkdirs()
    df.rdd.mapPartitionsWithIndex { case (pid, it) =>
      if (!it.hasNext) Iterator.single(0L)
      else {
        val file = new java.io.File(dir, f"part-$pid%05d.safetensors")
        val tmpV = java.io.File.createTempFile(s"st-v-$pid-", ".bin")
        val tmpI = java.io.File.createTempFile(s"st-i-$pid-", ".bin")
        // assemble under a temp sibling, rename into place on success
        val tmpOut = java.io.File.createTempFile(s"st-o-$pid-", ".tmp",
          file.getParentFile)
        var n = 0L
        var dim = -1
        try {
          val vOut = new BufferedOutputStream(new FileOutputStream(tmpV), 1 << 16)
          val iOut = new BufferedOutputStream(new FileOutputStream(tmpI), 1 << 16)
          try {
            it.foreach { row =>
              val vec = row.getSeq[Float](vecIdx)
              if (row.isNullAt(idIdx) || vec == null)
                throw new IllegalArgumentException(
                  s"safetensors row $n: null $idCol/$vecCol — a skipped row " +
                    "would desynchronize the id and vector tensors")
              if (dim < 0) dim = vec.length
              if (vec.length != dim)
                throw new IllegalArgumentException(
                  s"safetensors row $n: ragged vector (${vec.length} vs $dim)")
              val vb = ByteBuffer.allocate(bpe * dim)
                .order(ByteOrder.LITTLE_ENDIAN)
              dtype match {
                case "F32" => vec.foreach(vb.putFloat)
                case "F16" => vec.foreach(x => vb.putShort(floatToF16(x)))
                case "BF16" => vec.foreach(x => vb.putShort(floatToBf16(x)))
              }
              vOut.write(vb.array())
              val ib = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
              ib.putLong(row.getLong(idIdx))
              iOut.write(ib.array())
              n += 1
            }
          } finally { vOut.close(); iOut.close() }
          // data buffer = [vector tensor][id tensor]; offsets in bytes
          val vBytes = bpe.toLong * dim * n
          val iBytes = 8L * n
          val header = mapper.createObjectNode()
          val vNode = header.putObject(vecCol)
          vNode.put("dtype", dtype)
          vNode.putArray("shape").add(n).add(dim.toLong)
          vNode.putArray("data_offsets").add(0L).add(vBytes)
          val iNode = header.putObject(idCol)
          iNode.put("dtype", "I64")
          iNode.putArray("shape").add(n)
          iNode.putArray("data_offsets").add(vBytes).add(vBytes + iBytes)
          val hj = mapper.writeValueAsBytes(header)
          val out = new BufferedOutputStream(new FileOutputStream(tmpOut), 1 << 16)
          try {
            val lb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
            lb.putLong(hj.length.toLong)
            out.write(lb.array())
            out.write(hj)
            for (t <- Seq(tmpV, tmpI)) {
              val in = new BufferedInputStream(new FileInputStream(t), 1 << 16)
              try {
                val buf = new Array[Byte](1 << 16)
                var r = in.read(buf)
                while (r >= 0) { if (r > 0) out.write(buf, 0, r); r = in.read(buf) }
              } finally in.close()
            }
          } finally out.close()
          java.nio.file.Files.move(tmpOut.toPath, file.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        } finally {
          // covers the iteration phase too — a ragged/null throw must
          // not leak the partition temp files on the executor
          tmpV.delete(); tmpI.delete(); tmpOut.delete(); ()
        }
        Iterator.single(n)
      }
    }.count()
    ()
  }

  /** Read a path/glob of `.safetensors` files written by [[write]]
    * (or any file carrying one I64 `[n]` and one F32/F16/BF16
    * `[n, dim]` tensor under the given names — the half dtypes widen
    * exactly) back as (`idCol` LONG, `vecCol` ARRAY<FLOAT>) rows.
    * File-level parallelism; each file is streamed once in
    * data-offset order, and the stream is closed on EVERY path —
    * success, header-validation throw, or truncation — before any
    * row is emitted (both tensors are in memory by then, so partial
    * downstream consumption cannot pin the stream either).
    */
  def read(spark: SparkSession, path: String, idCol: String,
           vecCol: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path)
      .flatMap { case (file, pds) =>
        val in = new DataInputStream(
          new BufferedInputStream(pds.open(), 1 << 16))
        // parse + slice EAGERLY under try/finally; the returned
        // iterator reads only from the in-memory buffers
        val (n, dim, dtype, vBytes, iBytes) = try {
          val lb = new Array[Byte](8)
          in.readFully(lb)
          val hLen = ByteBuffer.wrap(lb).order(ByteOrder.LITTLE_ENDIAN).getLong
          if (hLen <= 0 || hLen > (1L << 26))
            throw new IllegalArgumentException(
              s"$file: implausible safetensors header length $hLen")
          val hb = new Array[Byte](hLen.toInt)
          in.readFully(hb)
          val root = mapper.readTree(new String(hb, UTF_8))
          def tensor(name: String, dtypes: Set[String]) = {
            val t = root.get(name)
            if (t == null)
              throw new IllegalArgumentException(s"$file: no tensor '$name'")
            val dt = t.get("dtype").asText()
            if (!dtypes.contains(dt))
              throw new IllegalArgumentException(
                s"$file: $name dtype $dt not in ${dtypes.mkString("/")}")
            val sh = t.get("shape")
            val off = t.get("data_offsets")
            (dt, Seq.tabulate(sh.size())(i => sh.get(i).asLong()),
              off.get(0).asLong(), off.get(1).asLong())
          }
          val (vDt, vShape, vB, vE) = tensor(vecCol, Set("F32", "F16", "BF16"))
          val (_, iShape, iB, iE) = tensor(idCol, Set("I64"))
          val bpe = vecBpe(vDt)
          val n = iShape.head
          val dim = if (vShape.length == 2) vShape(1).toInt
            else throw new IllegalArgumentException(
              s"$file: $vecCol must be rank 2, got ${vShape.length}")
          if (vShape.head != n)
            throw new IllegalArgumentException(
              s"$file: tensor row counts differ ($n vs ${vShape.head})")
          if (vE - vB != bpe.toLong * n * dim || iE - iB != 8L * n)
            throw new IllegalArgumentException(
              s"$file: data_offsets disagree with shapes")
          // a single in-memory tensor slice caps at one JVM array —
          // reject beyond-2GiB tensors LOUDLY (an Int truncation here
          // would either crash confusingly or, worse, silently slice
          // the wrong bytes and desynchronize ids from vectors);
          // writers control this via rows-per-partition
          for ((nm, len) <- Seq((vecCol, vE - vB), (idCol, iE - iB)))
            if (len > Int.MaxValue - 8)
              throw new IllegalArgumentException(
                s"$file: tensor $nm is $len bytes — beyond one JVM " +
                  "array; re-shard with fewer rows per partition")
          // this writer lays vectors first; a foreign file may not —
          // stream in offset order, holding only the earlier tensor.
          // skipBytes may skip LESS than asked (buffered stream
          // boundary) — loop it, and treat EOF mid-skip as truncation
          def skipFully(k: Long): Unit = {
            var left = k
            while (left > 0) {
              val s = in.skipBytes(math.min(left, Int.MaxValue.toLong).toInt)
              if (s <= 0) throw new EOFException(s"skip stalled at $left")
              left -= s
            }
          }
          skipFully(math.min(vB, iB))
          def readBytes(k: Long): Array[Byte] = {
            val a = new Array[Byte](k.toInt); in.readFully(a); a
          }
          val (vBytes, iBytes) =
            if (vB <= iB) { val v = readBytes(vE - vB)
              skipFully(iB - vE); (v, readBytes(iE - iB)) }
            else { val i = readBytes(iE - iB)
              skipFully(vB - iE); (readBytes(vE - vB), i) }
          (n, dim, vDt, vBytes, iBytes)
        } catch { case e: EOFException =>
          throw new IllegalArgumentException(
            s"$file: truncated safetensors file", e)
        } finally in.close()
        val vv = ByteBuffer.wrap(vBytes).order(ByteOrder.LITTLE_ENDIAN)
        val iv = ByteBuffer.wrap(iBytes).order(ByteOrder.LITTLE_ENDIAN)
        val decode: Int => Float = dtype match {
          case "F32" => e => vv.getFloat(e * 4)
          case "F16" => e => f16ToFloat(vv.getShort(e * 2))
          case "BF16" => e => bf16ToFloat(vv.getShort(e * 2))
        }
        (0L until n).iterator.map { r =>
          val vec = new Array[Float](dim)
          var j = 0
          while (j < dim) { vec(j) = decode(r.toInt * dim + j); j += 1 }
          (iv.getLong(r.toInt * 8), vec.toSeq)
        }
      }
      .toDF(idCol, vecCol)
  }
}
