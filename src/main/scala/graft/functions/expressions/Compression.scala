package graft.functions.expressions

import java.io.ByteArrayOutputStream
import java.util.Base64
import java.util.zip.{Deflater, GZIPInputStream, GZIPOutputStream, Inflater}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ADX compression scalars over base64 text:
  * `zlib_compress_to_base64_string` / `zlib_decompress_from_base64_string`
  * and the gzip pair. JDK `java.util.zip` end to end — no new
  * dependencies. Decompress returns NULL on malformed input (base64 or
  * stream), the try-null convention the rest of the scalar surface uses;
  * output is capped at 64 MiB per value (a zip bomb must not OOM an
  * executor — oversize decompresses null out rather than allocate).
  *
  * Native Catalyst expressions in the `Ipv6Norm` shape: interpreted eval
  * and generated Java both call the static codecs, so the string lanes
  * stay inside whole-stage codegen.
  */
abstract class CompressionExpr extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean  = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  protected def staticCall: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.expressions.Compression.$staticCall($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
}

case class ZlibCompress(child: Expression) extends CompressionExpr {
  override protected def staticCall: String = "zlibCompress"
  override def nullSafeEval(input: Any): Any =
    Compression.zlibCompress(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): ZlibCompress =
    copy(child = newChild)
  override def prettyName: String = "zlib_compress_to_base64_string"
}

case class ZlibDecompress(child: Expression) extends CompressionExpr {
  override protected def staticCall: String = "zlibDecompress"
  override def nullSafeEval(input: Any): Any =
    Compression.zlibDecompress(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): ZlibDecompress =
    copy(child = newChild)
  override def prettyName: String = "zlib_decompress_from_base64_string"
}

case class GzipCompress(child: Expression) extends CompressionExpr {
  override protected def staticCall: String = "gzipCompress"
  override def nullSafeEval(input: Any): Any =
    Compression.gzipCompress(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): GzipCompress =
    copy(child = newChild)
  override def prettyName: String = "gzip_compress_to_base64_string"
}

case class GzipDecompress(child: Expression) extends CompressionExpr {
  override protected def staticCall: String = "gzipDecompress"
  override def nullSafeEval(input: Any): Any =
    Compression.gzipDecompress(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): GzipDecompress =
    copy(child = newChild)
  override def prettyName: String = "gzip_decompress_from_base64_string"
}

object Compression {

  /** Decompressed-size cap: a hostile tiny payload can inflate without
    * bound; past this we abort and return null instead of allocating on.
    */
  private val MaxOut = 64 * 1024 * 1024

  def zlibCompress(s: UTF8String): UTF8String = {
    if (s == null) return null
    val in  = s.getBytes
    val d   = new Deflater()
    d.setInput(in); d.finish()
    val out = new ByteArrayOutputStream(in.length / 2 + 16)
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    UTF8String.fromString(Base64.getEncoder.encodeToString(out.toByteArray))
  }

  def zlibDecompress(s: UTF8String): UTF8String = {
    if (s == null) return null
    try {
      val comp = Base64.getDecoder.decode(s.toString)
      val inf  = new Inflater()
      inf.setInput(comp)
      val out = new ByteArrayOutputStream(comp.length * 2 + 16)
      val buf = new Array[Byte](4096)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
          throw new java.util.zip.DataFormatException("truncated or preset-dictionary stream")
        out.write(buf, 0, n)
        if (out.size() > MaxOut) throw new java.util.zip.DataFormatException("oversize")
      }
      inf.end()
      UTF8String.fromBytes(out.toByteArray)
    } catch { case _: Exception => null }
  }

  def gzipCompress(s: UTF8String): UTF8String = {
    if (s == null) return null
    val out = new ByteArrayOutputStream()
    val gz  = new GZIPOutputStream(out)
    gz.write(s.getBytes); gz.close()
    UTF8String.fromString(Base64.getEncoder.encodeToString(out.toByteArray))
  }

  def gzipDecompress(s: UTF8String): UTF8String = {
    if (s == null) return null
    try {
      val comp = Base64.getDecoder.decode(s.toString)
      val gz   = new GZIPInputStream(new java.io.ByteArrayInputStream(comp))
      val out  = new ByteArrayOutputStream(comp.length * 2 + 16)
      val buf  = new Array[Byte](4096)
      var n = gz.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        if (out.size() > MaxOut) throw new java.io.IOException("oversize")
        n = gz.read(buf)
      }
      UTF8String.fromBytes(out.toByteArray)
    } catch { case _: Exception => null }
  }
}
