package graft.sources

import javax.xml.parsers.DocumentBuilderFactory
import scala.util.Try

/** Minimal OME-XML (ImageDescription) bridge: parse the <Pixels> header
  * for sizes/order/physical sizes/channel names, and generate a minimal
  * conformant document for export. Namespace-agnostic DOM. */
object OmeXml {

  final case class PixelsMeta(
      sizeX: Int, sizeY: Int, sizeZ: Int, sizeC: Int, sizeT: Int,
      dimensionOrder: String,
      physicalSizeX: Option[Float], physicalSizeY: Option[Float],
      physicalSizeZ: Option[Float],
      channelNames: Seq[String],
      channelColors: Seq[Option[Long]] = Nil)

  def looksLikeOme(s: String): Boolean = s.contains("<OME") || s.contains(":OME")

  def parse(xml: String): Option[PixelsMeta] = Try {
    val dbf = DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(true)
    // hardening: no external entities
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    val doc = dbf.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
    val pixels = doc.getElementsByTagNameNS("*", "Pixels")
    require(pixels.getLength > 0, "no Pixels element")
    val p = pixels.item(0).asInstanceOf[org.w3c.dom.Element]
    def attr(n: String): Option[String] =
      Option(p.getAttribute(n)).filter(_.nonEmpty)
    def intAttr(n: String, d: Int): Int = attr(n).map(_.toInt).getOrElse(d)
    val chans = doc.getElementsByTagNameNS("*", "Channel")
    val names = (0 until chans.getLength).flatMap { i =>
      Option(chans.item(i).asInstanceOf[org.w3c.dom.Element].getAttribute("Name"))
        .filter(_.nonEmpty)
    }
    // Channel Color: signed 32-bit RGBA per the OME schema -> unsigned long
    val colors = (0 until chans.getLength).map { i =>
      Option(chans.item(i).asInstanceOf[org.w3c.dom.Element].getAttribute("Color"))
        .filter(_.nonEmpty).flatMap(s => Try(s.toInt.toLong & 0xffffffffL).toOption)
    }
    PixelsMeta(
      sizeX = intAttr("SizeX", 0), sizeY = intAttr("SizeY", 0),
      sizeZ = intAttr("SizeZ", 1), sizeC = intAttr("SizeC", 1),
      sizeT = intAttr("SizeT", 1),
      dimensionOrder = attr("DimensionOrder").getOrElse("XYZCT"),
      physicalSizeX = attr("PhysicalSizeX").map(_.toFloat),
      physicalSizeY = attr("PhysicalSizeY").map(_.toFloat),
      physicalSizeZ = attr("PhysicalSizeZ").map(_.toFloat),
      channelNames = names,
      channelColors = colors)
  }.toOption

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** Minimal OME-XML for export (reference writes via OmeTiffWriter,
    * export.py:219-228; we emit the same structural core). */
  def generate(name: String, sizeX: Int, sizeY: Int, sizeZ: Int, sizeC: Int,
      sizeT: Int, dimensionOrder: String,
      physicalSizeX: Option[Float], physicalSizeY: Option[Float],
      physicalSizeZ: Option[Float], channelNames: Seq[String],
      channelColors: Seq[Option[Long]] = Nil): String = {
    val phys = Seq(
      physicalSizeX.map(v => s"""PhysicalSizeX="$v""""),
      physicalSizeY.map(v => s"""PhysicalSizeY="$v""""),
      physicalSizeZ.map(v => s"""PhysicalSizeZ="$v"""")).flatten.mkString(" ")
    val chans = channelNames.zipWithIndex.map { case (n, i) =>
      // Color: signed 32-bit RGBA (OME schema; export.py:182-195 carries
      // channel display colors through when enabled)
      val color = channelColors.lift(i).flatten
        .map(c => s""" Color="${c.toInt}"""").getOrElse("")
      s"""<Channel ID="Channel:0:$i" Name="${esc(n)}"$color SamplesPerPixel="1"/>"""
    }.mkString
    s"""<?xml version="1.0" encoding="UTF-8"?>""" +
      """<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06">""" +
      s"""<Image ID="Image:0" Name="${esc(name)}">""" +
      s"""<Pixels ID="Pixels:0" DimensionOrder="$dimensionOrder" Type="uint16" """ +
      s"""SizeX="$sizeX" SizeY="$sizeY" SizeZ="$sizeZ" SizeC="$sizeC" SizeT="$sizeT" """ +
      s"""$phys BigEndian="false" Interleaved="false">""" +
      chans + """<TiffData/></Pixels></Image></OME>"""
  }

  /** Page index -> (t,c,z) for a given DimensionOrder: the first of the
    * trailing Z/C/T letters varies fastest across pages (OME-TIFF plane
    * ordering convention). */
  def pageCoords(order: String, sizeZ: Int, sizeC: Int, sizeT: Int,
      page: Int): (Int, Int, Int) = {
    val axes = order.toUpperCase.drop(2) // e.g. "ZCT"; missing axes = size 1
    require(axes.nonEmpty && axes.forall("ZCT".contains(_)) &&
      axes.distinct == axes, s"Bad DimensionOrder '$order'")
    var t = 0; var c = 0; var z = 0
    var stride = 1
    axes.foreach { a =>
      val size = a match { case 'Z' => sizeZ; case 'C' => sizeC; case 'T' => sizeT }
      val idx = (page / stride) % size
      a match { case 'Z' => z = idx; case 'C' => c = idx; case 'T' => t = idx }
      stride *= size
    }
    (t, c, z)
  }
}
