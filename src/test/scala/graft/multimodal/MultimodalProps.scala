package graft.multimodal

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the byte-level media codecs. Pure
  * functions (no Spark jobs), so these run the full default case count
  * — the catalog queries (q115/q123) only exercise the hash-reachable
  * corner of the parameter space; these cover the domain.
  */
object MultimodalProps extends Properties("graft.multimodal") {

  private val mp4Params = for {
    ts   <- Gen.choose(1, 1000000)
    dur  <- Gen.choose(0, Int.MaxValue)
    w    <- Gen.choose(0, 65535) // 16.16 fixed point caps dims at 2^16-1
    h    <- Gen.choose(0, 65535)
    nf   <- Gen.choose(0, 2000)
    seed <- Gen.long
  } yield (ts, dur, w, h, nf, seed)

  property("mp4 synth→parse round trip is the identity") =
    forAll(mp4Params) { case (ts, dur, w, h, nf, seed) =>
      Multimodal.mp4Meta(Multimodal.mp4Bytes(ts, dur, w, h, nf, seed))
        .contains(Mp4Meta("isom", ts, dur * 1000L / ts, 1, w, h, nf.toLong))
    }

  property("every strict prefix of a valid MP4 parses to None") =
    forAll(mp4Params, Gen.choose(0.0, 1.0)) {
      case ((ts, dur, w, h, nf, seed), frac) =>
        val bytes = Multimodal.mp4Bytes(ts, dur, w, h, nf, seed)
        val cut = math.min((bytes.length * frac).toInt, bytes.length - 1)
        Multimodal.mp4Meta(bytes.take(cut)).isEmpty
    }

  private val wavParams = for {
    sr   <- Gen.choose(1, 192000)
    ch   <- Gen.choose(1, 8)
    ns   <- Gen.choose(0, 500)
    seed <- Gen.long
  } yield (sr, ch, ns, seed)

  property("wav synth→parse round trip is the identity (16-bit PCM)") =
    forAll(wavParams) { case (sr, ch, ns, seed) =>
      val align = ch * 2
      Multimodal.wavMeta(Multimodal.wavBytes(sr, ch, 16, ns, seed))
        .contains(WavMeta(1, ch, sr, 16, ns.toLong,
          ns.toLong * align * 1000L / (sr.toLong * align)))
    }
}
