package graft.sources

/** S1's NetCDF-4 arm: a [[SceneCodec]] that serves band slices from
  * HDF5-backed scene files on disk — `"$path/sc<N>.nc"`, the modern
  * container family the reference's `netCDF4.Dataset` opens
  * (`build_dataset.py:28`, `apply_model.py:110`). Same seam, same
  * planning: the swap is `option("codec",
  * classOf[Hdf5SceneCodec].getName).option("path", dir)` — nothing in
  * partition split / column pruning / filter pushdown changes.
  *
  * I/O discipline (the 100 TB contract, the NcSceneCodec rules):
  *  - `parse` reads only superblock + group machinery + object
  *    headers + chunk indexes — never dataset data;
  *  - each `bind` materializes only the partition's line band:
  *    contiguous layout is ONE seek+read; chunked layout touches only
  *    the chunks intersecting the band (HDF5's native banded access),
  *    so task I/O is O(band), not O(scene);
  *  - the file handle is opened once per partition and released in
  *    [[close]].
  */
final class Hdf5SceneCodec extends SceneCodec {

  private var dir: String = _
  private var raf: java.io.RandomAccessFile = _
  private var src: Hdf5.ByteSource = _
  private var file: Hdf5.H5File = _
  private var openedScene: Int = -1

  override def configure(options: Map[String, String]): Unit =
    dir = options.getOrElse("path",
      throw new IllegalArgumentException(
        "Hdf5SceneCodec needs option 'path' (directory of sc<N>.nc files)"))

  private def open(scene: Int): Unit = if (openedScene != scene) {
    close()
    val f = new java.io.File(dir, s"sc$scene.nc")
    raf = new java.io.RandomAccessFile(f, "r")
    src = new Hdf5.FileSource(raf)
    file = Hdf5.parse(src).getOrElse(
      throw new java.io.IOException(s"$f is not an HDF5 file (subset)"))
    openedScene = scene
  }

  override def bind(p: ScenePartition, field: String): (Int, Int) => Any = {
    open(p.scene)
    val ds = file.datasets.find(_.name == field).getOrElse(
      throw new IllegalArgumentException(
        s"dataset '$field' not in sc${p.scene}.nc " +
          s"(has ${file.datasets.map(_.name).mkString(", ")})"))
    require(ds.dims.length == 2, s"$field is not a 2-D [line, sample] dataset")
    val width = ds.dims(1).toInt
    require(width == p.width,
      s"$field width $width != planned ${p.width} — scene/options mismatch")
    val lines = p.lineEnd - p.lineStart + 1
    val band = Hdf5.readRows(src, ds, p.lineStart, lines)
    val isInt = !ds.isFloat
    if (isInt) (l: Int, s: Int) => band((l - p.lineStart) * width + s).toInt
    else (l: Int, s: Int) => band((l - p.lineStart) * width + s)
  }

  override def close(): Unit = {
    if (raf != null) { raf.close(); raf = null }
    openedScene = -1
  }
}

object Hdf5SceneCodec {
  /** Write `nScenes` HDF5 scene files carrying the [[SceneFixtures]]
    * fields (same doubles, same integer arithmetic as the synthetic
    * codec and the classic-NetCDF fixtures — all three read paths are
    * bit-comparable). `superblockVersion` picks the v0 symbol-table or
    * v2 link-message group flavor; `chunk`/`deflate` pick the layout
    * (chunked+deflate is what netCDF4-python writes by default). */
  def writeFixtureScenes(dir: java.io.File, nScenes: Int, h: Int, w: Int,
                         superblockVersion: Int = 0,
                         chunk: Option[(Int, Int)] = None,
                         deflate: Int = 0): Unit = {
    dir.mkdirs()
    import Hdf5._
    (0 until nScenes).foreach { sc =>
      def grid(f: (Int, Int) => Double): Array[Double] =
        Array.tabulate(h * w)(i => f(i / w, i % w))
      val vars = Seq(
        H5Var("sar_primary", TFloat64, h, w,
          grid((l, s) => math.sin(l * 0.7) * math.cos(s * 0.3) + 2.0),
          chunk, deflate),
        H5Var("sar_secondary", TFloat64, h, w,
          grid((l, s) => math.cos(l * 0.2) * math.sin(s * 0.5) + 2.0),
          chunk, deflate),
        H5Var("polygon_id", TInt32, h, w,
          grid((l, s) => ((l / 4) * 10 + (s / 4) % 10 + 1).toDouble),
          chunk, deflate),
        H5Var("distance_map", TFloat64, h, w, grid((_, s) => s * 3.0),
          chunk, deflate))
      Hdf5.writeFile(new java.io.File(dir, s"sc$sc.nc"), vars,
        superblockVersion)
    }
  }
}
