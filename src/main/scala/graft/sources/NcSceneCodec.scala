package graft.sources

/** S1 de-stubbed: a [[SceneCodec]] that serves band slices from REAL
  * NetCDF-classic files on disk — `"$path/sc<N>.nc"`, one file per
  * scene, exactly the reference's layout (`build_dataset.py:28` opens
  * one `.nc` per scene; variables `utility.py:64-80`). Configured via
  * the reader option `path`; nothing in the planning layer changes —
  * the swap is `option("codec", classOf[NcSceneCodec].getName)
  * .option("path", dir)`, which is precisely what the seam was built
  * to prove.
  *
  * I/O discipline (the 100 TB contract):
  *  - the header is parsed from a bounded PREFIX read (64 KiB — a
  *    classic header with a handful of vars is < 1 KiB), never the
  *    whole file;
  *  - each `bind` materializes only the partition's line band with ONE
  *    `seek(begin + lineStart·width·size)` + one contiguous read —
  *    classic's fixed row-major layout makes banded access native, so
  *    task I/O is O(band), not O(scene);
  *  - the file handle is opened once per partition and released in
  *    [[close]].
  *
  * NetCDF-4 (HDF5 chunked layout) remains environment-blocked
  * (SURVEY §7.8.4) — this codec covers the CDF-1/CDF-2 classic family.
  */
final class NcSceneCodec extends SceneCodec {

  private var dir: String = _
  private var raf: java.io.RandomAccessFile = _
  private var header: NcClassic.NcHeader = _
  private var openedScene: Int = -1

  override def configure(options: Map[String, String]): Unit =
    dir = options.getOrElse("path",
      throw new IllegalArgumentException(
        "NcSceneCodec needs option 'path' (directory of sc<N>.nc files)"))

  private def open(scene: Int): Unit = if (openedScene != scene) {
    close()
    val f = new java.io.File(dir, s"sc$scene.nc")
    raf = new java.io.RandomAccessFile(f, "r")
    val prefix = new Array[Byte](math.min(raf.length(), 65536L).toInt)
    raf.seek(0); raf.readFully(prefix)
    header = NcClassic.parseHeader(prefix, raf.length()).getOrElse(
      throw new java.io.IOException(s"$f is not a classic NetCDF file"))
    openedScene = scene
  }

  override def bind(p: ScenePartition, field: String): (Int, Int) => Any = {
    open(p.scene)
    val v = header.varNamed(field).getOrElse(
      throw new IllegalArgumentException(
        s"variable '$field' not in sc${p.scene}.nc " +
          s"(has ${header.vars.map(_.name).mkString(", ")})"))
    require(v.dimIds.length == 2, s"$field is not a 2-D [line, sample] variable")
    val width = header.dims(v.dimIds(1)).length
    require(width == p.width,
      s"$field width $width != planned ${p.width} — scene/options mismatch")
    val lines = p.lineEnd - p.lineStart + 1
    val band = NcClassic.readFixedSlice(raf, header, v,
      p.lineStart.toLong * width, lines * width)
    val isInt = v.ncType == NcClassic.NcByte || v.ncType == NcClassic.NcShort ||
      v.ncType == NcClassic.NcInt
    if (isInt) (l: Int, s: Int) => band((l - p.lineStart) * width + s).toInt
    else (l: Int, s: Int) => band((l - p.lineStart) * width + s)
  }

  override def close(): Unit = {
    if (raf != null) { raf.close(); raf = null }
    openedScene = -1
  }
}

object NcSceneCodec {
  /** Write `nScenes` classic scene files carrying the [[SceneFixtures]]
    * fields (same doubles, same integer arithmetic), so DSv2 reads
    * through the REAL codec are bit-comparable to the synthetic ones.
    * `version` picks CDF-1 or CDF-2 offsets. */
  def writeFixtureScenes(dir: java.io.File, nScenes: Int, h: Int, w: Int,
                         version: Int = 1): Unit = {
    dir.mkdirs()
    val dims = Seq("line" -> h, "sample" -> w)
    import NcClassic._
    (0 until nScenes).foreach { sc =>
      def grid(f: (Int, Int) => Double): Array[Double] = {
        val a = new Array[Double](h * w)
        var l = 0
        while (l < h) {
          var s = 0
          while (s < w) { a(l * w + s) = f(l, s); s += 1 }
          l += 1
        }
        a
      }
      val vars = Seq(
        (VarSpec("sar_primary", NcDouble, Seq(0, 1)),
          grid((l, s) => math.sin(l * 0.7) * math.cos(s * 0.3) + 2.0)),
        (VarSpec("sar_secondary", NcDouble, Seq(0, 1)),
          grid((l, s) => math.cos(l * 0.2) * math.sin(s * 0.5) + 2.0)),
        (VarSpec("polygon_id", NcInt, Seq(0, 1)),
          grid((l, s) => ((l / 4) * 10 + (s / 4) % 10 + 1).toDouble)),
        (VarSpec("distance_map", NcDouble, Seq(0, 1)),
          grid((_, s) => s * 3.0)))
      val gatts = Seq(
        NcAttr("scene", NcChar, 0, s"sc$sc", Array.empty),
        NcAttr("aoi_lowerright_line", NcInt, 1, "", Array((h - 1).toDouble)))
      NcClassic.write(new java.io.File(dir, s"sc$sc.nc"), version, dims,
        gatts, vars)
    }
  }
}
