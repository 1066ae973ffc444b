"""Multimodal column plumbing: binary payloads + typed metadata.

PNG, WAV, and AVI payloads are really decoded on the JVM side
(javax.imageio / javax.sound.sampled / a RIFF chunk walker over BI_RGB
DIB frames); only compressed video codecs fall back to the clearly-marked
byte-statistics stub — the schema, batch shape, and partitioning are the
production layout either way.
"""

from ._java import ctx, lift


def assets_from_documents(docs):
    """Demo asset table from the documents table (text bytes as payload)."""
    spark, jvm = ctx(docs)
    return lift(spark, jvm.graft.multimodal.Multimodal.assetsFromDocuments(
        docs._jdf))


def png_assets_from_documents(docs):
    """Asset table whose image rows carry REAL PNG payloads encoded from a
    deterministic pixel formula (round-trippable through the decoder)."""
    spark, jvm = ctx(docs)
    return lift(spark, jvm.graft.multimodal.Multimodal.pngAssetsFromDocuments(
        docs._jdf))


def wav_assets_from_documents(docs):
    """Asset table whose audio rows carry REAL 16-bit PCM WAV payloads from
    a deterministic sample formula (round-trippable through the decoder)."""
    spark, jvm = ctx(docs)
    return lift(spark, jvm.graft.multimodal.Multimodal.wavAssetsFromDocuments(
        docs._jdf))


def avi_assets_from_documents(docs):
    """Asset table whose video rows carry REAL RIFF/AVI containers of
    uncompressed BI_RGB DIB frames from a deterministic pixel formula."""
    spark, jvm = ctx(docs)
    return lift(spark, jvm.graft.multimodal.Multimodal.aviAssetsFromDocuments(
        docs._jdf))


def extract_features(assets):
    """Per-asset features in one partition-local pass; PNG/WAV/AVI rows get
    real decodes (decoded_*/sample_*/video_* columns populated)."""
    spark, jvm = ctx(assets)
    return lift(spark, jvm.graft.multimodal.Multimodal.extractFeatures(
        assets._jdf))


def resize_gray(assets, tw, th):
    """Nearest-neighbor resize of really-decoded PNG pixels to tw x th with
    a pinned floor index map; exact integer pixel sums per asset."""
    spark, jvm = ctx(assets)
    return lift(spark, jvm.graft.multimodal.Multimodal.resizeGray(
        assets._jdf, int(tw), int(th)))


def audio_window_energy(assets, window):
    """Per-window integer sums of squared decoded PCM samples (ragged last
    frame) — the energy profile feature, one row per (asset, window)."""
    spark, jvm = ctx(assets)
    return lift(spark, jvm.graft.multimodal.Multimodal.audioWindowEnergy(
        assets._jdf, int(window)))


def mjpeg_assets_from_documents(docs):
    """MJPEG AVI asset table: every 00dc chunk a standalone JPEG (the one
    compressed video codec a JVM encodes/decodes without native libs)."""
    spark, jvm = ctx(docs)
    return lift(spark, jvm.graft.multimodal.Multimodal
                .mjpegAssetsFromDocuments(docs._jdf))


def mjpeg_decode_table(docs):
    """Really-decoded MJPEG metadata + lossy pixel sums per asset (decode
    failure -> null struct, never a task kill)."""
    spark, jvm = ctx(docs)
    return lift(spark, jvm.graft.multimodal.Multimodal
                .mjpegDecodeTable(docs._jdf))


def audio_spectral_tilt(assets, window=16):
    """Integer-exact DC/Nyquist/total energy per tumbling PCM frame of
    really-decoded WAV payloads (crude spectral-tilt discriminator)."""
    from ._java import ctx, lift
    spark, jvm = ctx(assets)
    return lift(spark, jvm.graft.multimodal.Multimodal.audioSpectralTilt(
        assets._jdf, int(window)))
