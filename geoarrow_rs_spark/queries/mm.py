"""mm query-catalog entries (split from queries.py, round 6)."""

from ._shared import *  # noqa: F401,F403
from ._shared import (  # noqa: F401
    _BM25_K1P1,
    _BM25_TERMS,
    _GRAM8_SQL,
    _NG3,
    _NS_GAP,
    _NS_HOUR,
    _banded_block,
    _hits_sql,
    _luhn_sql,
    _minhash_pairs_cte,
    _money_sum,
    _money_sum_sql,
    _spread,
    _t,
)



def mm_blob_stats(spark, sf_dir):
    """Opaque media blob statistics (size/digest family) over the synthesized binary column."""
    from ..datapipe.multimodal import blob_stats

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("blob")
    )
    return blob_stats(d, "blob").select(
        "doc_id", F.col("blob_bytes").cast("long").alias("blob_bytes"), "blob_sha256"
    )


ORACLE_MM_BLOB = """
SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS blob_bytes,
       sha256(text) AS blob_sha256
FROM documents
"""


_BMP_2X2_HEADER_HEX = (
    "424D460000000000000036000000280000000200000002000000010018000000"
    "000010000000130B0000130B00000000000000000000"
)


def mm_image_brightness(spark, sf_dir):
    """REAL image decode under oracle check: a 2x2 24-bit BMP is assembled
    NATIVELY (constant header + per-row gray pixel bytes), decoded by the
    actual pure-numpy BMP decoder inside mapInPandas, and the extracted
    mean/std features have the closed form k/255 and 0."""
    from ..datapipe.multimodal import extract_features

    d = _t(spark, sf_dir, "documents")
    kk = "lpad(hex(doc_id % 256), 2, '0')"
    row = f"concat(repeat({kk}, 6), '0000')"
    blob = f"unhex(concat('{_BMP_2X2_HEADER_HEX}', {row}, {row}))"
    src = d.selectExpr("doc_id", f"{blob} AS blob")
    feats = extract_features(src, "blob", dim=8)
    return feats.select(
        "doc_id",
        F.col("features")[0].alias("mean_r"),
        F.col("features")[3].alias("std_r"),
    )


ORACLE_MM_BRIGHTNESS = """
SELECT doc_id,
       CAST((doc_id % 256) / 255.0 AS REAL) AS mean_r,
       CAST(0.0 AS REAL) AS std_r
FROM documents
"""


_WAV_8S_HEADER_HEX = (
    "524946463400000057415645666D7420100000000100010040"
    "1F0000803E0000020010006461746110000000"
)


def mm_audio_features(spark, sf_dir):
    """REAL audio decode under oracle check: an 8-sample constant PCM16 WAV
    is assembled natively (constant header + little-endian sample bytes),
    decoded by the actual numpy WAV decoder, and rms == peak == v/32768,
    duration == 1 ms at 8 kHz — all closed-form (v/2^15 is exact)."""
    from ..datapipe.multimodal import extract_features

    d = _t(spark, sf_dir, "documents")
    # v = (doc_id % 100) * 25 fits int16 and is non-negative
    vhex = "lpad(hex((doc_id % 100) * 25), 4, '0')"
    le = f"concat(substr({vhex}, 3, 2), substr({vhex}, 1, 2))"
    blob = f"unhex(concat('{_WAV_8S_HEADER_HEX}', repeat({le}, 8)))"
    src = d.selectExpr("doc_id", f"{blob} AS blob")
    feats = extract_features(src, "blob", dim=8)
    return feats.select(
        "doc_id",
        F.col("features")[0].alias("rms"),
        F.col("features")[2].alias("peak"),
        F.col("features")[3].alias("duration_s"),
    )


ORACLE_MM_AUDIO = """
SELECT doc_id,
       CAST(((doc_id % 100) * 25) / 32768.0 AS REAL) AS rms,
       CAST(((doc_id % 100) * 25) / 32768.0 AS REAL) AS peak,
       CAST(0.001 AS REAL) AS duration_s
FROM documents
"""


_BMP_4X4_HEADER_HEX = (
    "424D660000000000000036000000280000000400000004000000010018000000"
    "000030000000130B0000130B00000000000000000000"
)


def mm_image_resize(spark, sf_dir):
    """REAL decode -> nearest-neighbor resize -> re-encode round-trip under
    byte-exact oracle check: a constant 2x2 BMP resized to 4x4 must equal
    the natively constructed constant 4x4 BMP, compared as full hex (DuckDB
    cannot hash blobs, so the oracle emits the expected hex string)."""
    from ..datapipe.multimodal import resize_images

    d = _t(spark, sf_dir, "documents")
    kk = "lpad(hex(doc_id % 256), 2, '0')"
    row2 = f"concat(repeat({kk}, 6), '0000')"
    blob = f"unhex(concat('{_BMP_2X2_HEADER_HEX}', {row2}, {row2}))"
    src = d.selectExpr("doc_id", f"{blob} AS blob")
    out = resize_images(src, "blob", 4, 4)
    return out.selectExpr("doc_id", "hex(resized) AS resized_hex")


ORACLE_MM_RESIZE = f"""
SELECT doc_id,
       upper(concat('{_BMP_4X4_HEADER_HEX}',
                    repeat(lpad(hex(doc_id % 256), 2, '0'), 48))) AS resized_hex
FROM documents
"""


def _gif_hex_parts():
    """Constant pieces of a per-doc 2x2 two-color GIF: everything except
    the 3 palette bytes of color 0 (gray level = doc_id % 256). The LZW
    payload for the fixed [0,1,1,0] pixel pattern comes from the engine's
    own encoder — which is validated byte-identically against the
    published GIF spec example, so this is not self-referential."""
    from ..datapipe.multimodal import _gif_lzw_encode

    lzw = _gif_lzw_encode([0, 1, 1, 0], 2)
    pre = "474946383961" + "02000200" + "80" + "0000"
    post = (
        "FF0000"                      # color 1 = red
        + "2C000000000200020000"      # image descriptor
        + "02"                        # LZW min code size
        + f"{len(lzw):02x}" + lzw.hex() + "00" + "3b"
    )
    return pre, post


def mm_gif_decode(spark, sf_dir):
    """REAL GIF decode under oracle check: per-doc 2x2 two-color GIF
    (gray level doc_id%256 + red) built from hex in BOTH engines, decoded
    through the from-scratch LZW codec (datapipe/multimodal.py), then
    header meta + per-channel means compared against the closed forms."""
    from ..datapipe.multimodal import attach_media_meta, extract_features

    pre, post = _gif_hex_parts()
    d = _t(spark, sf_dir, "documents")
    kk = "lpad(hex(doc_id % 256), 2, '0')"
    blob = f"unhex(concat('{pre}', repeat({kk}, 3), '{post}'))"
    src = d.selectExpr("doc_id", f"{blob} AS blob")
    meta = attach_media_meta(src, "blob")
    feats = extract_features(meta, "blob", dim=3)
    return feats.select(
        "doc_id",
        F.col("media_meta.media_type").alias("media_type"),
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
        F.col("features")[0].alias("mean_r"),
        F.col("features")[1].alias("mean_g"),
        F.col("features")[2].alias("mean_b"),
    )


ORACLE_MM_GIF = """
SELECT doc_id,
       'image/gif' AS media_type,
       CAST(2 AS INTEGER) AS width, CAST(2 AS INTEGER) AS height,
       CAST(((2.0 * (doc_id % 256) + 510.0) / 4.0) / 255.0 AS REAL) AS mean_r,
       CAST(((doc_id % 256) / 2.0) / 255.0 AS REAL) AS mean_g,
       CAST(((doc_id % 256) / 2.0) / 255.0 AS REAL) AS mean_b
FROM documents
"""


_TIFF_PRE_HEX = (
    "49492a00080000000a0000010300010000000200000001010300010000000200000002"
    "0103000100000008000000030103000100000001000000060103000100000001000000"
    "1101040001000000860000001501030001000000010000001601030001000000020000"
    "001701040001000000040000001c010300010000000100000000000000"
)


def mm_tiff_decode(spark, sf_dir):
    """REAL baseline-TIFF decode under oracle check: per-doc 2x2 8-bit
    grayscale little-endian TIFF built from hex in BOTH engines (fixed
    header+IFD prefix + 4 pixel bytes [k, k, 0, 128], k = doc_id%256),
    decoded through the pure-struct IFD walker (datapipe/multimodal.py
    decode_tiff), then header meta + mean brightness vs closed forms."""
    from ..datapipe.multimodal import attach_media_meta, extract_features

    d = _t(spark, sf_dir, "documents")
    kk = "lpad(hex(doc_id % 256), 2, '0')"
    blob = f"unhex(concat('{_TIFF_PRE_HEX}', {kk}, {kk}, '00', '80'))"
    src = d.selectExpr("doc_id", f"{blob} AS blob")
    meta = attach_media_meta(src, "blob")
    feats = extract_features(meta, "blob", dim=3)
    return feats.select(
        "doc_id",
        F.col("media_meta.media_type").alias("media_type"),
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
        F.col("media_meta.n_channels").alias("n_channels"),
        F.col("features")[0].alias("mean_gray"),
    )


ORACLE_MM_TIFF = """
SELECT doc_id,
       'image/tiff' AS media_type,
       CAST(2 AS INTEGER) AS width, CAST(2 AS INTEGER) AS height,
       CAST(1 AS INTEGER) AS n_channels,
       CAST(((2.0 * (doc_id % 256) + 128.0) / 4.0) / 255.0 AS REAL) AS mean_gray
FROM documents
"""
