package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.ops.Multimodal

/** Property tests for the decode-side multimodal operators: each checked
  * against the generator formulas on random geometries — scene layouts,
  * planted silence patterns, and resize shapes the fixture queries'
  * fixed parameters never exercise (1×N images, single-window audio,
  * scenes shorter than the delta support, upscales).
  */
object MultimodalPropSpec extends Properties("Multimodal.reference") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  property("sceneCuts: detected boundaries == planted scene starts") =
    // Dims start at 8: below ~50 pixels the mod-251 wrap tail (a few
    // pixels jumping 250 within a scene) can push a within-scene mean
    // past the threshold — the detector contract assumes frames larger
    // than a postage stamp, as real video is.
    Prop.forAllNoShrink(
      Gen.chooseNum(8, 24), Gen.chooseNum(8, 20),
      Gen.chooseNum(1, 6), Gen.chooseNum(1, 4),
      Gen.chooseNum(0L, 1000L)) { (w, h, sceneLen, nScenes, seed) =>
      val gif = Multimodal.syntheticSceneGif(w, h, sceneLen, nScenes, seed)
      val cuts = Multimodal.decodeFrameDeltas(gif)
        .filter { case (_, sum, npix) => sum > 20L * npix }.map(_._1)
      val expected = (1 until nScenes).map(_ * sceneLen)
      Prop(cuts == expected) :|
        s"w=$w h=$h len=$sceneLen scenes=$nScenes cuts=$cuts expected=$expected"
    }

  // Random non-overlapping planted silence runs, in normalized
  // (sorted, merged) form — the detector must return exactly that
  // normalization.
  private val genRuns: Gen[(Int, Seq[(Int, Int)])] =
    for {
      nWindows <- Gen.chooseNum(1, 16)
      flags <- Gen.listOfN(nWindows, Gen.oneOf(true, false, false))
    } yield {
      val runs = Seq.newBuilder[(Int, Int)]
      var start = -1
      flags.zipWithIndex.foreach { case (silent, i) =>
        if (silent) { if (start < 0) start = i }
        else if (start >= 0) { runs += ((start, i - start)); start = -1 }
      }
      if (start >= 0) runs += ((start, flags.size - start))
      (nWindows, runs.result())
    }

  property("decodeSilentRuns == the planted runs' normalization") =
    Prop.forAllNoShrink(genRuns, Gen.chooseNum(8, 200),
      Gen.chooseNum(0L, 1000L)) { case ((nWindows, runs), windowLen, seed) =>
      val wav = Multimodal.syntheticSpeechWav(windowLen, nWindows, 8000, seed, runs)
      val got = Multimodal.decodeSilentRuns(wav, windowLen)
      Prop(got == runs) :| s"nW=$nWindows wl=$windowLen got=$got planted=$runs"
    }

  property("thumbnailChecksum == the formula, including upscales and 1-pixel axes") =
    Prop.forAllNoShrink(
      Gen.chooseNum(1, 24), Gen.chooseNum(1, 24),
      Gen.chooseNum(1, 12), Gen.chooseNum(1, 12),
      Gen.chooseNum(0L, 1000L)) { (w, h, outW, outH, seed) =>
      val png = Multimodal.syntheticGrayPng(w, h, seed)
      var expected = 0L
      for (y <- 0 until outH; x <- 0 until outW) {
        val (sx, sy) = (x * w / outW, y * h / outH)
        expected += ((seed * 131 + sy.toLong * w + sx * 7) % 251) * (y.toLong * outW + x + 1)
      }
      val got = Multimodal.thumbnailChecksum(png, outW, outH)
      Prop(got == expected) :| s"w=$w h=$h out=${outW}x$outH got=$got expected=$expected"
    }
}
