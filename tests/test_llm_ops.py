"""Unit tests for dedup / similarity / text / multimodal operators."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from us_dot_flights_lakehouse_spark.llm import dedup, multimodal
from us_dot_flights_lakehouse_spark.llm.dedup import (
    exact_dedup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from us_dot_flights_lakehouse_spark.llm.similarity import cosine_topk, lsh_cosine_topk
from us_dot_flights_lakehouse_spark.llm.textstats import lang_id, text_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups_whitespace_and_case_insensitive(spark):
    docs = _docs(
        spark,
        [(1, "Hello  World"), (2, "hello world"), (3, "different doc entirely")],
    )
    groups = {r["keeper_doc_id"]: r["n_copies"] for r in exact_dedup_groups(docs).collect()}
    assert groups == {1: 2, 3: 1}


def test_ngram_jaccard_finds_planted_neardup(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    docs = _docs(spark, [(1, base), (2, near), (3, "completely unrelated words here that share nothing at all")])
    pairs = ngram_jaccard_pairs(docs, threshold=0.5).collect()
    assert [(r["doc_id_a"], r["doc_id_b"]) for r in pairs] == [(1, 2)]
    assert pairs[0]["jaccard"] > 0.7


def test_minhash_lsh_finds_planted_neardup(spark):
    base = " ".join(f"w{i}" for i in range(60))
    near = base.replace("w59", "zz")  # jaccard ~ (58-2)/(58+2) high
    docs = _docs(spark, [(1, base), (2, near), (3, " ".join(f"x{i}" for i in range(60)))])
    pairs = minhash_lsh_pairs(docs, threshold=0.5).collect()
    assert [(r["doc_id_a"], r["doc_id_b"]) for r in pairs] == [(1, 2)]


def test_simhash_near_for_similar_docs(spark):
    base = " ".join(f"w{i}" for i in range(50))
    docs = _docs(
        spark,
        [(1, base), (2, base + " extra"), (3, " ".join(f"q{i}" for i in range(50)))],
    )
    pairs = {(r["doc_id_a"], r["doc_id_b"]): r["hamming"] for r in simhash_pairs(docs, max_hamming=3).collect()}
    assert (1, 2) in pairs
    assert pairs[(1, 2)] <= 3


def test_cosine_topk_exact_ranks(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 1.0]),
            (3, [0.7, 0.7]),
        ],
        "vec_id long, embedding array<float>",
    )
    qs = emb.filter(F.col("vec_id") == 0)
    got = [
        r["neighbor_id"]
        for r in cosine_topk(emb, qs, k=3).orderBy("rank").collect()
    ]
    assert got == [1, 3, 2]  # by cosine to (1,0)


def test_lsh_topk_recall_vs_bruteforce(spark, sf_small):
    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 4)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, qs, k=3).collect()
    }
    # 4 planes -> 16 buckets: right granularity for a 500-vector corpus
    # (n_planes scales with corpus size; 8+ for millions of vectors)
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_cosine_topk(emb, qs, k=3, dim=64, n_planes=4).collect()
    }
    # approximate search must return *something* per query and overlap exact
    assert len(approx) > 0
    assert len(exact & approx) > 0


def test_text_stats_counts(spark):
    docs = _docs(spark, [(1, "The cat and the dog!")])
    r = text_stats(docs).collect()[0]
    assert r["n_tokens"] == 5
    assert r["n_unique_tokens"] == 4  # 'the' twice after lowering
    assert r["n_punct"] == 1
    assert r["n_stopwords"] == 3  # the, and, the
    assert math.isclose(r["token_diversity"], 4 / 5)


def test_lang_id_priority_and_und(spark):
    docs = _docs(
        spark,
        [
            (1, "the cat is in the house"),
            (2, "el gato que se fue no es de la casa"),
            (3, "zzz qqq www"),
        ],
    )
    got = {r["doc_id"]: r["lang_pred"] for r in lang_id(docs).collect()}
    assert got == {1: "en", 2: "es", 3: "und"}


def _be32(v):
    return v.to_bytes(4, "big")


def _be16(v):
    return v.to_bytes(2, "big")


#: structurally valid headers: PNG sig+IHDR(64x48), JPEG SOI+APP0+SOF0
#: (100x32), GIF89a screen descriptor (320x200)
PNG = (
    b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR" + _be32(64) + _be32(48)
    + b"\x08\x06\x00\x00\x00"
)
JPG = (
    b"\xff\xd8"
    + b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    + b"\xff\xc0\x00\x11\x08" + _be16(32) + _be16(100)
    + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
)
GIF = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little") + b"\xf7\x00\x00"


def _media_df(spark):
    return spark.createDataFrame(
        [(1, bytearray(PNG)), (2, bytearray(JPG)), (3, bytearray(b"plainbytes"))],
        "id long, payload binary",
    )


def test_media_type_detection(spark):
    df = _media_df(spark).select("id", multimodal.detect_media_type("payload").alias("mt"))
    got = {r["id"]: r["mt"] for r in df.collect()}
    assert got == {1: "image/png", 2: "image/jpeg", 3: "application/octet-stream"}


def test_byte_features_mapinpandas(spark):
    feats = {r["id"]: r for r in multimodal.byte_features(_media_df(spark)).collect()}
    assert feats[1]["n_bytes"] == len(PNG)
    # all-same-bytes tail -> low entropy; exact value deterministic
    assert feats[3]["n_bytes"] == 10
    assert feats[2]["mean_byte"] == pytest.approx(sum(JPG) / len(JPG))


def test_media_metadata_struct(spark):
    df = multimodal.with_media_metadata(_media_df(spark))
    r = {x["id"]: x["media_meta"] for x in df.collect()}
    assert r[1]["media_type"] == "image/png"
    assert r[1]["n_bytes"] == len(PNG)
    # PNG dims come from the JVM-side IHDR expression
    assert (r[1]["width"], r[1]["height"]) == (64, 48)
    # JPEG needs the kernel parser; expression path leaves dims NULL
    assert r[2]["width"] is None
    assert r[3]["width"] is None


def test_decode_image_headers_all_formats(spark):
    df = spark.createDataFrame(
        [
            (1, bytearray(PNG)),
            (2, bytearray(JPG)),
            (3, bytearray(GIF)),
            (4, bytearray(b"\xff\xd8\xff\xe0\x00\x04\x00\x00")),  # JPEG, no SOF
            (5, bytearray(b"plainbytes")),
            (6, None),
        ],
        "id long, payload binary",
    )
    got = {
        r["id"]: (r["media_type"], r["width"], r["height"])
        for r in multimodal.decode_image_headers(df).collect()
    }
    assert got[1] == ("image/png", 64, 48)
    assert got[2] == ("image/jpeg", 100, 32)
    assert got[3] == ("image/gif", 320, 200)
    assert got[4] == ("image/jpeg", None, None)
    assert got[5] == ("application/octet-stream", None, None)
    assert got[6] == (None, None, None)


def test_png_gif_dims_expressions(spark):
    df = spark.createDataFrame(
        [(1, bytearray(PNG)), (3, bytearray(GIF))], "id long, payload binary"
    )
    from pyspark.sql import functions as SF

    r = {
        x["id"]: (x["d"]["width"], x["d"]["height"])
        for x in df.select(
            "id",
            SF.when(SF.col("id") == 1, multimodal.png_dims("payload"))
            .otherwise(multimodal.gif_dims("payload"))
            .alias("d"),
        ).collect()
    }
    assert r[1] == (64, 48)
    assert r[3] == (320, 200)


def test_png_roundtrip_all_modes():
    import numpy as np

    rng = np.random.default_rng(7)
    for mode, shape in (
        ("L", (5, 4)),
        ("LA", (3, 6, 2)),
        ("RGB", (4, 3, 3)),
        ("RGBA", (2, 2, 4)),
    ):
        a = rng.integers(0, 256, size=shape, dtype=np.uint8)
        w, h, got_mode, px = multimodal.png_decode(multimodal.png_encode(a, mode))
        assert (w, h, got_mode) == (shape[1], shape[0], mode)
        assert np.array_equal(px.squeeze(), a.squeeze())


def test_png_decode_sub_up_average_paeth_filters():
    """Hand-build IDAT streams exercising filter types 1-4 and check the
    unfiltered pixels against the spec recurrences."""
    import struct
    import zlib

    import numpy as np

    def build(h, w, scanlines):
        def chunk(typ, body):
            return (
                struct.pack(">I", len(body))
                + typ
                + body
                + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"".join(scanlines)))
            + chunk(b"IEND", b"")
        )

    # 2x4 gray: row0 Sub(1), row1 Up(2)
    data = build(2, 4, [bytes([1, 10, 5, 5, 5]), bytes([2, 1, 1, 1, 1])])
    _, _, _, px = multimodal.png_decode(data)
    assert px[:, :, 0].tolist() == [[10, 15, 20, 25], [11, 16, 21, 26]]
    # 2x3 gray: row0 None, row1 Average(3): cur = raw + (left+up)//2
    data = build(2, 3, [bytes([0, 8, 16, 24]), bytes([3, 4, 4, 4])])
    _, _, _, px = multimodal.png_decode(data)
    # row1: x0: 4+(0+8)//2=8; x1: 4+(8+16)//2=16; x2: 4+(16+24)//2=24
    assert px[1, :, 0].tolist() == [8, 16, 24]
    # 2x3 gray: row0 None, row1 Paeth(4)
    data = build(2, 3, [bytes([0, 10, 20, 30]), bytes([4, 1, 2, 3])])
    _, _, _, px = multimodal.png_decode(data)
    # Paeth pred x0: a=0,b=10,c=0 -> p=10 -> nearest is b=10 -> 11
    # x1: a=11,b=20,c=10 -> p=21: pa=10,pb=1,pc=11 -> b=20 -> 22
    # x2: a=22,b=30,c=20 -> p=32: pa=10,pb=2,pc=12 -> b=30 -> 33
    assert px[1, :, 0].tolist() == [11, 22, 33]
    assert np.asarray(px).dtype == np.uint8


def test_bmp_decode_24bit_bottom_up():
    import numpy as np
    import struct

    # 2x2 24-bit BMP, bottom-up, rows padded to 4 bytes (2*3=6 -> pad 2)
    w = h = 2
    row_bytes = (w * 3 + 3) & ~3
    # pixel (x,y) RGB = (x*10, y*10, 99); file stores bottom row first, BGR
    def bgr(x, y):
        return bytes([99, y * 10, x * 10])

    pix = bgr(0, 1) + bgr(1, 1) + b"\x00\x00" + bgr(0, 0) + bgr(1, 0) + b"\x00\x00"
    off = 54
    header = (
        b"BM"
        + struct.pack("<IHHI", off + len(pix), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 0, 0, 0, 0)
    )
    gw, gh, mode, px = multimodal.bmp_decode(header + pix)
    assert (gw, gh, mode) == (2, 2, "RGB")
    assert px[0, 1].tolist() == [10, 0, 99]  # x=1,y=0
    assert px[1, 0].tolist() == [0, 10, 99]  # x=0,y=1
    assert np.asarray(px).flags["C_CONTIGUOUS"]


def test_decode_image_operator_decodes_png_nulls_jpeg(spark):
    import numpy as np

    a = np.arange(12, dtype=np.uint8).reshape(3, 4)
    png = multimodal.png_encode(a, "L")
    jpeg = bytes.fromhex("FFD8FFE0") + b"\x00" * 32  # codec-gated format
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(jpeg)), (3, None)],
        "id long, payload binary",
    )
    rows = {r["id"]: r for r in multimodal.decode_image(df).collect()}
    assert (rows[1]["width"], rows[1]["height"], rows[1]["mode"]) == (4, 3, "L")
    assert list(bytes(rows[1]["pixels"])) == list(range(12))
    assert rows[2]["pixels"] is None and rows[3]["pixels"] is None


def test_avi_roundtrip_and_frame_sampling(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, size=(6, 3, 5, 3), dtype=np.uint8)
    avi = multimodal.avi_encode(frames, us_per_frame=40_000)  # 25 fps
    us, w, h, raw = multimodal.avi_parse(avi)
    assert (us, w, h, len(raw)) == (40_000, 5, 3, 6)

    df = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(b"RIFF\x00\x00\x00\x00WAVE")), (3, None)],
        "id long, payload binary",
    )
    # every_ms=80 at 40ms period -> stride 2 -> frames 0, 2, 4
    rows = multimodal.sample_frames(df, every_ms=80).collect()
    sampled = sorted(
        (r["frame_idx"], r["ts_ms"]) for r in rows if r["id"] == 1
    )
    assert sampled == [(0, 0), (2, 80), (4, 160)]
    got0 = next(r for r in rows if r["id"] == 1 and r["frame_idx"] == 0)
    assert (got0["width"], got0["height"], got0["mode"]) == (5, 3, "RGB")
    px = np.frombuffer(bytes(got0["pixels"]), np.uint8).reshape(3, 5, 3)
    assert np.array_equal(px, frames[0])
    # non-AVI RIFF and null payloads produce null-pixel rows, not errors
    for other in (2, 3):
        (row,) = [r for r in rows if r["id"] == other]
        assert row["pixels"] is None and row["frame_idx"] is None


def test_sample_frames_gates_compressed_frames(spark):
    import struct

    import numpy as np

    frames = np.zeros((2, 2, 2, 3), dtype=np.uint8)
    avi = bytearray(multimodal.avi_encode(frames, us_per_frame=40_000))
    # flip both '00db' fourccs to '00dc' (compressed) in place
    pos = 0
    while True:
        pos = avi.find(b"00db", pos)
        if pos < 0:
            break
        avi[pos : pos + 4] = b"00dc"
    df = spark.createDataFrame([(1, bytes(avi))], "id long, payload binary")
    (row,) = multimodal.sample_frames(df, every_ms=40).collect()
    assert row["pixels"] is None  # codec-gated, not mis-decoded


def test_byte_features_custom_id_column(spark):
    # regression: the Arrow extractor must read the aliased "id" column,
    # not the caller's id_col name
    df = spark.createDataFrame([(7, bytearray(b"ab"))], "doc_id long, payload binary")
    row = multimodal.byte_features(df, id_col="doc_id").collect()[0]
    assert row["id"] == 7
    assert row["n_bytes"] == 2
    assert row["mean_byte"] == (97 + 98) / 2


def test_ivf_topk_recall_vs_bruteforce(spark, sf_small):
    from us_dot_flights_lakehouse_spark.llm.similarity import (
        cosine_topk,
        ivf_cosine_topk,
    )

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, qs, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_cosine_topk(emb, qs, k=5, nlist=8, nprobe=4).collect()
    }
    # nprobe=half the cells: expect decent overlap with the exact top-5
    assert len(exact & approx) / len(exact) >= 0.5


def test_lsh_bucket_cap_suppresses_giant_dup_cluster(spark):
    # 20 exact clones (one giant bucket: 190 pairs/band) + 1 genuine
    # near-dup pair; cap=5 must keep the pair and drop the cluster
    clones = [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(20)]
    near = [
        (100, "one two three four five six seven eight nine ten"),
        (101, "one two three four five six seven eight nine eleven"),
    ]
    docs = spark.createDataFrame(clones + near, "doc_id long, text string")
    capped = dedup.minhash_lsh_pairs(docs, threshold=0.3, max_bucket_size=5).collect()
    got = {(r["doc_id_a"], r["doc_id_b"]) for r in capped}
    assert (100, 101) in got
    assert all(a >= 100 for a, _ in got)  # no clone-cluster pairs survive
    # uncapped finds the 190 clone pairs too (sanity that the cap did it)
    uncapped = dedup.minhash_lsh_pairs(docs, threshold=0.3).count()
    assert uncapped >= 190


def test_quality_filters_signals_and_keep(spark):
    from us_dot_flights_lakehouse_spark.llm.textstats import quality_filters

    good = "the cat and the dog ran over to the big red barn for dinner"
    repeat = "spam ham " * 30  # heavy bigram repetition, no stopword variety
    short = "hi"
    rows = {r["doc_id"]: r for r in quality_filters(
        _docs(spark, [(1, good), (2, repeat.strip()), (3, short)])
    ).collect()}
    assert rows[1]["keep"] is True
    assert rows[1]["n_distinct_stopwords"] >= 2
    # "spam ham spam ham ..." has almost all duplicate bigrams
    assert rows[2]["dup_bigram_frac"] > 0.9
    assert rows[2]["keep"] is False
    # single/short docs: too few words, zero bigrams, no crash
    assert rows[3]["n_bigrams"] == 0 and rows[3]["dup_bigram_frac"] == 0.0
    assert rows[3]["keep"] is False


def test_repetition_stats_closed_form(spark):
    from us_dot_flights_lakehouse_spark.llm.textstats import repetition_stats

    diverse = " ".join(f"w{i}" for i in range(40))  # no repeated n-grams
    rows = {r["doc_id"]: r for r in repetition_stats(
        _docs(spark, [(1, "a b a b a b"), (2, diverse), (3, "hi")])
    ).collect()}
    r1 = rows[1]  # toks [a b a b a b]: token_chars 6
    # "a b" x3 covers 3*2=6 of 6 chars; "a b a" x2 covers 2*3=6; the
    # 4-gram "a b a b" x2 covers 2*4=8 -> capped at 1.0
    assert r1["n_words"] == 6 and r1["token_chars"] == 6
    assert r1["top_2gram_frac"] == 1.0
    assert r1["top_3gram_frac"] == 1.0
    assert r1["top_4gram_frac"] == 1.0
    # both 5-grams occur once -> no duplicated-gram chars
    assert r1["dup_5gram_frac"] == 0.0 and r1["dup_10gram_frac"] == 0.0
    assert r1["rep_keep"] is False
    r2 = rows[2]  # all n-grams unique: top fracs are single-gram coverage
    assert r2["token_chars"] == 110  # 10 two-char + 30 three-char tokens
    assert r2["dup_5gram_frac"] == 0.0 and r2["dup_10gram_frac"] == 0.0
    assert 0 < r2["top_2gram_frac"] < 0.20
    assert r2["rep_keep"] is True
    # single-token doc: every gram list is empty, fracs 0, no crash; a
    # repetition filter has no repetition evidence -> keep (shortness is
    # quality_filters' verdict, not this one's)
    r3 = rows[3]
    assert r3["top_2gram_frac"] == 0.0 and r3["rep_keep"] is True


def _ref_bpe(word_freqs, n_merges):
    """Reference BPE (Sennrich et al. 2016) with the same greedy
    left-to-right merge application and (count desc, pair asc) tie-break
    as llm/tokenizer.py."""
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((l, r, c))
        newv = {}
        for syms, f in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            newv[tuple(out)] = newv.get(tuple(out), 0) + f
        vocab = newv
    return merges


def test_bpe_train_matches_reference(spark):
    from us_dot_flights_lakehouse_spark.llm.tokenizer import (
        bpe_train,
        merge_pair_counts,
    )

    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    text = " ".join(w for w, f in freqs.items() for _ in range(f))
    docs = _docs(spark, [(1, text)])
    # iteration-0 candidate table agrees with a hand count
    counts = {
        (r["left_sym"], r["right_sym"]): r["pair_count"]
        for r in merge_pair_counts(docs).collect()
    }
    assert counts[("e", "s")] == 9  # newest x6 + widest x3
    assert counts[("l", "o")] == 7  # low x5 + lower x2
    assert counts[("s", "t")] == 9
    # first merge has count 9; 'es' < 'st' so (e, s) wins the tie-break
    merges = bpe_train(docs, n_merges=6)
    assert merges == _ref_bpe(freqs, 6)
    assert merges[0] == ("e", "s", 9)


def test_chunk_documents_boundaries(spark):
    from us_dot_flights_lakehouse_spark.llm.curation import chunk_documents

    text = "abcdefghij" * 25  # 250 chars
    out = chunk_documents(
        _docs(spark, [(1, text), (2, "tiny")]), chunk_chars=100, overlap=20
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    # starts advance by stride=80 up to n_chars-overlap=230: 1, 81, 161
    assert [r["chunk_start"] for r in c1] == [1, 81, 161]
    assert [r["chunk_idx"] for r in c1] == [0, 1, 2]
    # consecutive chunks overlap by exactly `overlap` characters
    assert c1[0]["chunk_text"][-20:] == c1[1]["chunk_text"][:20]
    # reassembling de-overlapped chunks reproduces the document
    rebuilt = c1[0]["chunk_text"] + "".join(r["chunk_text"][20:] for r in c1[1:])
    assert rebuilt == text
    # short doc: exactly one (short) chunk
    assert [(r["chunk_start"], r["chunk_text"]) for r in by_doc[2]] == [(1, "tiny")]


def test_chunk_documents_rejects_bad_overlap(spark):
    from us_dot_flights_lakehouse_spark.llm.curation import chunk_documents

    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "x")]), chunk_chars=10, overlap=10)


def test_source_caps_deterministic_cap(spark):
    from us_dot_flights_lakehouse_spark.llm.curation import source_caps

    docs = spark.createDataFrame(
        [(i, f"s{i % 2}") for i in range(20)], "doc_id long, source string"
    )
    out = source_caps(docs, cap=3, source_col="source").collect()
    kept = [r for r in out if r["kept"]]
    assert len(out) == 20  # nothing dropped, verdict column instead
    assert len(kept) == 6 and all(r["slot"] <= 3 for r in kept)
    # deterministic: a second run keeps the identical subset
    again = {r["doc_id"] for r in source_caps(docs, cap=3, source_col="source").collect() if r["kept"]}
    assert {r["doc_id"] for r in kept} == again


def test_wav_meta_parses_canonical_header(spark):
    import struct

    from us_dot_flights_lakehouse_spark.llm.multimodal import wav_meta

    # canonical 44-byte PCM header: 2ch, 44100 Hz, 16-bit, 1000 frames
    channels, rate, bits, frames = 2, 44100, 16, 1000
    block = channels * bits // 8
    data = frames * block
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + data) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate, rate * block, block, bits)
        + b"data" + struct.pack("<I", data)
    )
    df = spark.createDataFrame([(1, bytearray(hdr))], "id long, payload binary")
    row = df.select(wav_meta("payload").alias("m")).collect()[0]["m"]
    assert (row["channels"], row["sample_rate"], row["bits_per_sample"]) == (2, 44100, 16)
    assert row["data_bytes"] == data and row["n_frames"] == frames
    assert row["duration_ms"] == frames * 1000 // rate


def test_shard_assign_uniform_and_deterministic(spark):
    from us_dot_flights_lakehouse_spark.llm.curation import shard_assign

    docs = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    out = shard_assign(docs, n_shards=8).collect()
    assert len(out) == 200
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos_in_shard"])
    assert set(by_shard) == set(range(8))
    # positions are dense 1..n within each shard
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # deterministic across runs
    again = {(r["doc_id"], r["shard"], r["pos_in_shard"])
             for r in shard_assign(docs, n_shards=8).collect()}
    assert {(r["doc_id"], r["shard"], r["pos_in_shard"]) for r in out} == again


def test_bigram_commonality_scores(spark):
    from us_dot_flights_lakehouse_spark.llm.textstats import bigram_commonality

    docs = _docs(
        spark,
        [
            (1, "a b c"),        # bigrams: "a b", "b c"
            (2, "a b d"),        # bigrams: "a b", "b d"
            (3, "x"),            # no bigrams -> no output row
        ],
    )
    rows = {r["id"]: r for r in bigram_commonality(docs).collect()}
    assert set(rows) == {1, 2}
    # "a b" occurs twice in the corpus; "b c"/"b d" once each
    assert rows[1]["n_bigrams"] == 2 and rows[1]["total_freq"] == 3
    assert rows[1]["avg_bigram_freq"] == 1.5
    assert rows[2]["total_freq"] == 3


def test_mp4_meta_kernel_and_malformed(spark):
    import struct

    from us_dot_flights_lakehouse_spark.llm.multimodal import mp4_meta

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    mvhd_v0 = box(
        b"mvhd",
        b"\x00\x00\x00\x00" + b"\x00" * 8 + struct.pack(">II", 90000, 450000),
    )
    good = (
        box(b"ftyp", b"isom" + b"\x00" * 4)
        + box(b"free", b"")
        + box(b"moov", mvhd_v0)
    )
    rows = {r["id"]: r for r in mp4_meta(spark.createDataFrame(
        [
            (1, bytearray(good)),
            (2, bytearray(b"\x00\x00\x00\x02bad!")),  # size < 8: malformed
            (3, bytearray(b"RIFF....")),               # not an mp4 at all
        ],
        "id long, payload binary",
    )).collect()}
    assert rows[1]["major_brand"] == "isom"
    assert (rows[1]["timescale"], rows[1]["duration"]) == (90000, 450000)
    assert rows[1]["duration_ms"] == 450000 * 1000 // 90000
    for i in (2, 3):
        assert rows[i]["timescale"] is None and rows[i]["duration_ms"] is None


def test_lsh_neardup_subset_and_full_recall_on_true_duplicates(spark, sf_small):
    """Two contracts of the LSH-pruned pair stage:
    1. SUBSET of the exact all-pairs set — verification is exact, so
       pruning can only lose pairs, never invent them.
    2. ~Full recall on TRUE duplicates (the SemDeDup target): planted
       near-identical vectors (cos ~0.9997) agree on (almost) every
       sign bit, so they share buckets in essentially every table. The
       8x8 layout's partial recall on borderline 63-degree pairs is
       deliberate, oracle-replicated semantics."""
    from pyspark.sql import functions as F

    from us_dot_flights_lakehouse_spark.llm.dedup import (
        embedding_neardup_pairs,
        embedding_neardup_pairs_lsh,
    )

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    # plant 20 exact-duplicate partners: same vector, one flipped low bit
    dups = (
        emb.filter(F.col("vec_id") < 20)
        .withColumn("vec_id", F.col("vec_id") + 1_000_000)
        .withColumn(
            "embedding",
            F.transform("embedding", lambda x: (x + F.lit(1e-4)).cast("float")),
        )
    )
    corpus = emb.unionByName(dups)
    exact = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in embedding_neardup_pairs(corpus, threshold=0.45).collect()
    }
    pruned = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in embedding_neardup_pairs_lsh(corpus, threshold=0.45, dim=64).collect()
    }
    assert pruned <= exact
    planted = {(i, i + 1_000_000) for i in range(20)}
    assert planted <= exact
    assert len(planted & pruned) >= 19  # >= 95% recall on true duplicates


def test_line_dedup_keeps_first_occurrence_and_blanks(spark):
    """Global line dedup: repeated lines survive only at the smallest
    (doc, line_idx); whitespace-only lines always survive; docs
    reassemble in original line order."""
    docs = spark.createDataFrame(
        [
            (1, "alpha\nshared footer\nbeta"),
            (2, "shared footer\ngamma\n\ndelta"),
            (3, "shared footer\nalpha"),
        ],
        "doc_id long, text string",
    )
    got = {r["id"]: r for r in dedup.line_dedup(docs).collect()}
    assert got[1]["text_deduped"] == "alpha\nshared footer\nbeta"
    assert (got[1]["n_lines"], got[1]["n_kept"]) == (3, 3)
    # doc 2 loses its copy of the footer but keeps its blank line
    assert got[2]["text_deduped"] == "gamma\n\ndelta"
    assert (got[2]["n_lines"], got[2]["n_kept"]) == (4, 3)
    # doc 3 loses both lines (footer first seen in doc 1, alpha too)
    assert got[3]["text_deduped"] == ""
    assert (got[3]["n_lines"], got[3]["n_kept"]) == (2, 0)


def test_decoders_survive_malformed_bytes(spark):
    """Fuzz contract: arbitrary/truncated bytes — including ones that
    start with valid magics — must produce null rows, never task
    failures."""
    import numpy as np

    rng = np.random.default_rng(11)
    png_sig = b"\x89PNG\r\n\x1a\n"
    blobs = [
        bytes(rng.integers(0, 256, size=n, dtype=np.uint8))
        for n in (0, 1, 7, 64, 513)
    ]
    blobs += [
        png_sig,  # magic, no chunks
        png_sig + b"\x00\x00\x00\x0dIHDR" + b"\x00" * 13,  # depth 0 -> unsupported
        b"BM" + b"\x00" * 20,  # truncated BMP header
        b"RIFF\x10\x00\x00\x00AVI " + b"\x00" * 8,  # AVI, no avih
        multimodal.png_encode(np.zeros((2, 2), np.uint8))[:-8],  # truncated IEND
    ]
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in enumerate(blobs)], "id long, payload binary"
    )
    img_rows = multimodal.decode_image(df).collect()
    assert len(img_rows) == len(blobs)
    vid_rows = multimodal.sample_frames(df, every_ms=40).collect()
    assert len(vid_rows) == len(blobs)
    assert all(r["pixels"] is None for r in vid_rows)


def test_multiprobe_lsh_beats_single_probe_at_equal_candidate_budget(spark, sf_small):
    """Multi-probe LSH must buy strictly more recall per candidate than
    hash-random bucketing: 9 planes probed 4x has the same expected
    budget as 7 planes probed once (4/2^9 ≈ 1/2^7), but the probes are
    chosen by projection margin, not luck."""
    from pyspark.sql import functions as F
    from us_dot_flights_lakehouse_spark.llm import similarity as S

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 100)
    k = 5
    truth = {
        (r["query_id"], r["neighbor_id"]) for r in S.cosine_topk(emb, qs, k).collect()
    }

    def recall(df):
        got = {(r["query_id"], r["neighbor_id"]) for r in df.collect()}
        return len(got & truth) / len(truth)

    def candidates(n_planes, n_probes):
        corpus = S._prep(emb, "vec_id", "embedding").withColumn(
            "bucket", S.lsh_bucket(F.col("v"), 64, n_planes)
        )
        probes = (
            S._prep(qs, "vec_id", "embedding")
            .withColumn(
                "probes", S.lsh_probe_buckets(F.col("v"), 64, n_planes, n_probes)
            )
            .select(F.col("id").alias("qid"), F.explode("probes").alias("bucket"))
        )
        return (
            probes.join(corpus, "bucket").filter(F.col("qid") != F.col("id")).count()
        )

    single = recall(S.lsh_cosine_topk(emb, qs, k, dim=64, n_planes=7))
    multi = recall(
        S.lsh_cosine_topk_multiprobe(emb, qs, k, dim=64, n_planes=9, n_probes=4)
    )
    c_single, c_multi = candidates(7, 1), candidates(9, 4)
    # equal budget (within 10%), strictly better recall
    assert c_multi <= c_single * 1.10
    assert multi > single


def test_lsh_probe_buckets_flips_lowest_margin_bits(spark):
    """Probe set = base bucket first, then single-bit XOR flips ordered
    by |projection| margin — distinct buckets, correct count."""
    from pyspark.sql import functions as F
    from us_dot_flights_lakehouse_spark.llm import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(20)
    rows = (
        S._prep(emb, "vec_id", "embedding")
        .select(
            S.lsh_bucket(F.col("v"), 64, 8).alias("base"),
            S.lsh_probe_buckets(F.col("v"), 64, 8, 4).alias("probes"),
        )
        .collect()
    )
    for r in rows:
        assert len(r["probes"]) == 4
        assert len(set(r["probes"])) == 4
        assert r["probes"][0] == r["base"]
        for p in r["probes"][1:]:
            diff = p ^ r["base"]
            assert diff and (diff & (diff - 1)) == 0  # exactly one bit flipped


# --- baseline JPEG codec ----------------------------------------------------


def test_jpeg_roundtrip_dc_only_is_lossless():
    import numpy as np

    from us_dot_flights_lakehouse_spark.llm.jpeg import (
        jpeg_decode,
        jpeg_encode_gray,
    )

    img = np.zeros((16, 16), np.uint8)
    for b in range(4):
        by, bx = divmod(b, 2)
        img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = 2 * ((7 * 9 + 37 * b) % 128)
    w, h, mode, px = jpeg_decode(jpeg_encode_gray(img))
    assert (w, h, mode) == (16, 16, "L")
    assert np.array_equal(px[:, :, 0], img)


def test_jpeg_roundtrip_smooth_image_bounded_error():
    import numpy as np

    from us_dot_flights_lakehouse_spark.llm.jpeg import (
        jpeg_decode,
        jpeg_encode_gray,
    )

    # smooth ramp: quantization error stays small; odd size exercises
    # edge-replication padding + crop
    g = np.clip(
        np.add.outer(np.linspace(0, 200, 19), np.linspace(0, 40, 13)), 0, 255
    ).astype(np.uint8)
    w, h, mode, px = jpeg_decode(jpeg_encode_gray(g))
    assert (w, h, mode) == (13, 19, "L")
    err = np.abs(px[:, :, 0].astype(int) - g.astype(int))
    assert err.max() <= 12  # Annex K table, smooth content


def test_jpeg_color_420_mcu_interleave_and_upsample():
    """Hand-crafted 3-component 4:2:0 stream (DC-only, luminance tables
    for all components): validates MCU block order (4xY, Cb, Cr),
    per-component DC predictors, chroma pixel-replication upsampling,
    and the JFIF YCbCr->RGB formula."""
    import numpy as np

    from us_dot_flights_lakehouse_spark.llm import jpeg as J

    yv = [140, 62, 250, 8]  # even -> exact DC quantization (q=16 -> /2)
    cbv, crv = 90, 180  # even
    dc_tab = J._HuffTable(*J.STD_DC_LUMA)
    ac_tab = J._HuffTable(*J.STD_AC_LUMA)
    bw = J._BitWriter()
    preds = {"y": 0, "cb": 0, "cr": 0}

    def put_block(comp, val):
        dc = (val - 128) // 2  # quantized DC under Annex K q[0,0]=16
        diff = dc - preds[comp]
        preds[comp] = dc
        t = J._category(diff)
        code, length = dc_tab.encode[t]
        bw.write(code, length)
        if t:
            bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        code, length = ac_tab.encode[0x00]  # EOB
        bw.write(code, length)

    for b in range(4):  # Y blocks: by-major then bx (v then h)
        put_block("y", yv[b])
    put_block("cb", cbv)
    put_block("cr", crv)
    scan = bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    zz_q = J.STD_LUMA_QUANT.reshape(64)[J.ZIGZAG].astype(np.uint8).tobytes()
    blob = (
        b"\xff\xd8"
        + seg(0xDB, b"\x00" + zz_q)
        + seg(
            0xC0,
            b"\x08" + (16).to_bytes(2, "big") + (16).to_bytes(2, "big") + b"\x03"
            + b"\x01\x22\x00"  # Y: 2x2 sampling
            + b"\x02\x11\x00"  # Cb: 1x1
            + b"\x03\x11\x00",  # Cr: 1x1
        )
        + seg(0xC4, b"\x00" + bytes(J.STD_DC_LUMA[0]) + bytes(J.STD_DC_LUMA[1]))
        + seg(0xC4, b"\x10" + bytes(J.STD_AC_LUMA[0]) + bytes(J.STD_AC_LUMA[1]))
        + seg(0xDA, b"\x03\x01\x00\x02\x00\x03\x00\x00\x3f\x00")
        + scan
        + b"\xff\xd9"
    )
    w, h, mode, px = J.jpeg_decode(blob)
    assert (w, h, mode) == (16, 16, "RGB")
    # expected: Y plane from the 4 blocks, constant Cb/Cr upsampled 2x
    y = np.zeros((16, 16))
    for b, v in enumerate(yv):
        by, bx = divmod(b, 2)
        y[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = v
    r = np.clip(np.round(y + 1.402 * (crv - 128.0)), 0, 255)
    g = np.clip(
        np.round(y - 0.344136 * (cbv - 128.0) - 0.714136 * (crv - 128.0)), 0, 255
    )
    bch = np.clip(np.round(y + 1.772 * (cbv - 128.0)), 0, 255)
    assert np.array_equal(px, np.stack([r, g, bch], axis=-1).astype(np.uint8))


def test_jpeg_progressive_rejected_and_null_row_contract(spark):
    import numpy as np
    import pytest

    from us_dot_flights_lakehouse_spark.llm import multimodal
    from us_dot_flights_lakehouse_spark.llm.jpeg import (
        jpeg_decode,
        jpeg_encode_gray,
    )

    blob = bytearray(jpeg_encode_gray(np.full((8, 8), 100, np.uint8)))
    i = blob.find(b"\xff\xc0")
    blob[i + 1] = 0xC2  # rebrand SOF0 as progressive
    with pytest.raises(NotImplementedError, match="SOF"):
        jpeg_decode(bytes(blob))

    df = spark.createDataFrame(
        [(1, bytes(blob)), (2, jpeg_encode_gray(np.full((8, 8), 100, np.uint8)))],
        "id long, payload binary",
    )
    rows = {r["id"]: r for r in multimodal.decode_image(df).collect()}
    assert rows[1]["width"] is None and rows[1]["pixels"] is None
    assert rows[2]["width"] == 8 and rows[2]["mode"] == "L"


def test_jpeg_restart_markers():
    """DRI/RSTn path: encoder-free check by splicing restart markers is
    fragile, so exercise the decoder's segment logic directly: encode two
    images and confirm byte-stuffed streams with 0xFF bytes decode (the
    stuffing path) — plus a hand-built two-MCU stream with DRI=1."""
    import numpy as np

    from us_dot_flights_lakehouse_spark.llm import jpeg as J

    dc_tab = J._HuffTable(*J.STD_DC_LUMA)
    ac_tab = J._HuffTable(*J.STD_AC_LUMA)

    def dc_only_segment(val, pred):
        bw = J._BitWriter()
        dc = (val - 128) // 2
        diff = dc - pred
        t = J._category(diff)
        code, length = dc_tab.encode[t]
        bw.write(code, length)
        if t:
            bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        code, length = ac_tab.encode[0x00]
        bw.write(code, length)
        return bw.flush()

    # 16x8 gray image = 2 MCUs; restart interval 1 -> RST0 between them,
    # and the second MCU's DC predictor must RESET to 0
    scan = dc_only_segment(200, 0) + b"\xff\xd0" + dc_only_segment(64, 0)

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    zz_q = J.STD_LUMA_QUANT.reshape(64)[J.ZIGZAG].astype(np.uint8).tobytes()
    blob = (
        b"\xff\xd8"
        + seg(0xDB, b"\x00" + zz_q)
        + seg(
            0xC0,
            b"\x08" + (8).to_bytes(2, "big") + (16).to_bytes(2, "big")
            + b"\x01\x01\x11\x00",
        )
        + seg(0xC4, b"\x00" + bytes(J.STD_DC_LUMA[0]) + bytes(J.STD_DC_LUMA[1]))
        + seg(0xC4, b"\x10" + bytes(J.STD_AC_LUMA[0]) + bytes(J.STD_AC_LUMA[1]))
        + seg(0xDD, (1).to_bytes(2, "big"))
        + seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")
        + scan
        + b"\xff\xd9"
    )
    w, h, mode, px = J.jpeg_decode(blob)
    assert (w, h) == (16, 8)
    assert np.array_equal(np.unique(px[:, :8]), [200])
    assert np.array_equal(np.unique(px[:, 8:]), [64])


def test_mjpeg_omitted_dht_quirk_decodes():
    """The classic MJPG quirk: frames ship without DHT, implying the
    Annex K default tables — ensure_huffman_tables splices them in."""
    import numpy as np
    import pytest

    from us_dot_flights_lakehouse_spark.llm.jpeg import (
        ensure_huffman_tables,
        jpeg_decode,
        jpeg_encode_gray,
    )

    img = np.full((8, 8), 150, np.uint8)
    blob = jpeg_encode_gray(img)
    # strip both DHT segments the encoder wrote
    out = bytearray()
    pos = 0
    while pos < len(blob):
        if blob[pos] == 0xFF and pos + 1 < len(blob) and blob[pos + 1] == 0xC4:
            pos += 2 + int.from_bytes(blob[pos + 2 : pos + 4], "big")
            continue
        if blob[pos] == 0xFF and blob[pos + 1] == 0xDA:
            out += blob[pos:]
            break
        out += blob[pos : pos + 1]
        pos += 1
    stripped = bytes(out)
    with pytest.raises(ValueError):
        jpeg_decode(stripped)  # no tables -> huffman lookup fails
    w, h, mode, px = jpeg_decode(ensure_huffman_tables(stripped))
    assert (w, h, mode) == (8, 8, "L")
    assert np.array_equal(np.unique(px), [150])
    # streams that carry their own tables pass through untouched
    assert ensure_huffman_tables(blob) == blob


def test_sample_frames_decodes_mjpeg_avi(spark):
    import numpy as np

    from us_dot_flights_lakehouse_spark.llm import multimodal

    vals = [2 * ((5 * 7 + 29 * f) % 128) for f in range(6)]
    frames = np.stack([np.full((8, 8), v, np.uint8) for v in vals])
    blob = multimodal.avi_encode_mjpeg(frames, us_per_frame=40_000)
    df = spark.createDataFrame([(1, blob)], "id long, payload binary")
    rows = sorted(
        multimodal.sample_frames(df, every_ms=80).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]
    for r in rows:
        assert (r["width"], r["height"], r["mode"]) == (8, 8, "L")
        a = np.frombuffer(r["pixels"], np.uint8)
        assert set(a.tolist()) == {vals[r["frame_idx"]]}


def test_wav_roundtrip_16bit_stereo_with_chunk_walk(spark):
    import numpy as np

    samples = np.stack(
        [np.arange(-500, 500, dtype=np.int16), np.arange(500, -500, -1, dtype=np.int16)],
        axis=1,
    )  # (1000, 2) stereo
    blob = multimodal.wav_encode(
        samples, 44100, extra_chunks=[(b"LIST", b"INFO" + b"\x00" * 7)]  # odd size: pad path
    )
    ch, rate, bits, decoded = multimodal.wav_parse(blob)
    assert (ch, rate, bits) == (2, 44100, 16)
    assert np.array_equal(decoded.reshape(-1, 2), samples)

    df = spark.createDataFrame([(7, bytearray(blob))], "id long, payload binary")
    row = multimodal.decode_audio(df).collect()[0]
    assert (row["channels"], row["sample_rate"], row["n_frames"]) == (2, 44100, 1000)
    assert np.array_equal(np.frombuffer(row["samples"], "<i2").reshape(-1, 2), samples)


def test_wav_8bit_lifted_to_int16():
    import numpy as np

    # 8-bit storage keeps only the high byte: values must be multiples of 256
    samples = (np.arange(-128, 128, dtype=np.int16) * 256).astype(np.int16)
    blob = multimodal.wav_encode(samples, 8000, bits=8)
    ch, rate, bits, decoded = multimodal.wav_parse(blob)
    assert (ch, rate, bits) == (1, 8000, 8)
    assert np.array_equal(decoded, samples)


def test_decode_audio_gates_non_pcm_and_non_wav(spark):
    import struct

    import numpy as np

    good = multimodal.wav_encode(np.array([1, -1, 2, -2], dtype=np.int16), 8000)
    # same container, format tag 3 (IEEE float) -> codec-gated null row
    nonpcm = bytearray(good)
    fmt_off = good.index(b"fmt ") + 8
    nonpcm[fmt_off : fmt_off + 2] = struct.pack("<H", 3)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, nonpcm), (3, bytearray(b"not audio at all"))],
        "id long, payload binary",
    )
    rows = {r["id"]: r for r in multimodal.decode_audio(df).collect()}
    assert rows[1]["n_frames"] == 4
    assert rows[2]["samples"] is None and rows[2]["channels"] is None
    assert rows[3]["samples"] is None


def test_pq_topk_recall_vs_bruteforce(spark, sf_small):
    from us_dot_flights_lakehouse_spark.llm.similarity import (
        cosine_topk,
        pq_cosine_topk,
    )

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, qs, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_cosine_topk(emb, qs, k=5, dim=64).collect()
    }
    # the fixture embeddings are near-i.i.d. noise (worst case for PQ:
    # true-neighbor margins are tiny vs quantization distortion), so the
    # bar is "far above chance" (random top-5 of 500 ~= 0.01 recall),
    # not high absolute recall — see the planted-cluster test for that
    assert len(exact & approx) / len(exact) >= 0.15


def test_pq_topk_high_recall_on_clustered_vectors(spark):
    import numpy as np

    from us_dot_flights_lakehouse_spark.llm.similarity import (
        cosine_topk,
        pq_cosine_topk,
    )

    # 20 well-separated cluster centers, 10 tight members each — the
    # structure real embedding corpora have and PQ is built for
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(20, 64)) * 10
    rows = []
    for ci, c in enumerate(centers):
        for j in range(10):
            v = c + rng.normal(size=64) * 0.1
            rows.append((ci * 10 + j, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = emb.filter(F.col("vec_id") % 10 == 0).limit(5)
    approx = pq_cosine_topk(emb, qs, k=5, dim=64).collect()
    assert len(approx) == 25
    # within a tight cluster every member shares the same codes, so ADC
    # ties and the id tiebreak can't reproduce exact intra-cluster order;
    # the meaningful PQ guarantee is that every retrieved neighbor comes
    # from the query's own cluster out of the 20 available
    assert all(r["neighbor_id"] // 10 == r["query_id"] // 10 for r in approx)
    # and the exact baseline agrees on cluster membership
    exact = cosine_topk(emb, qs, k=5).collect()
    assert all(r["neighbor_id"] // 10 == r["query_id"] // 10 for r in exact)


def test_pq_rejects_indivisible_subspaces(spark, sf_small):
    from us_dot_flights_lakehouse_spark.llm.similarity import pq_cosine_topk

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    with pytest.raises(ValueError, match="not divisible"):
        pq_cosine_topk(emb, emb.limit(1), k=5, dim=64, m=7)


def test_gif_roundtrip_plain_interlaced_and_clear_resets():
    import numpy as np

    pal = [(i, i, i) for i in range(256)]
    idx = ((7 * np.arange(64)) % 256).astype(np.uint8).reshape(8, 8)
    for interlace in (False, True):
        w, h, mode, px = multimodal.gif_decode(
            multimodal.gif_encode(idx, pal, interlace=interlace)
        )
        assert (w, h, mode) == (8, 8, "RGB")
        assert np.array_equal(px[:, :, 0], idx)
    # 2-bit palette on a 40x40 image: the fixed-width LZW stream must
    # emit clear codes before the decoder would widen
    pal4 = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    idx4 = (np.arange(1600) % 4).astype(np.uint8).reshape(40, 40)
    w, h, mode, px = multimodal.gif_decode(multimodal.gif_encode(idx4, pal4))
    assert np.array_equal(px, np.array(pal4, dtype=np.uint8)[idx4])


def test_gif_decode_animated_first_frame_and_malformed():
    import numpy as np

    pal = [(i, i, i) for i in range(256)]
    a = np.full((4, 4), 10, np.uint8)
    b = np.full((4, 4), 200, np.uint8)
    one = multimodal.gif_encode(a, pal)
    two = multimodal.gif_encode(b, pal)
    # splice frame 2's descriptor+data after frame 1 (strip header/GCT
    # /trailer of the second, drop trailer of the first), and prepend a
    # graphic-control extension so the skip path runs too
    gce = b"\x21\xf9\x04\x00\x0a\x00\x00\x00"
    animated = one[:-1] + gce + two[6 + 7 + 768 : ]
    w, h, mode, px = multimodal.gif_decode(animated)
    assert (w, h) == (4, 4)
    assert px[0, 0, 0] == 10  # FIRST frame wins
    with pytest.raises(ValueError):
        multimodal.gif_decode(b"GIF87a" + b"\x00" * 4)
    with pytest.raises(ValueError):
        multimodal.gif_decode(b"nope")


def test_decode_image_handles_gif(spark):
    import numpy as np

    pal = [(i, 0, 255 - i) for i in range(256)]
    idx = np.arange(64, dtype=np.uint8).reshape(8, 8)
    blob = multimodal.gif_encode(idx, pal)
    df = spark.createDataFrame([(1, bytearray(blob))], "id long, payload binary")
    row = multimodal.decode_image(df).collect()[0]
    assert (row["width"], row["height"], row["mode"]) == (8, 8, "RGB")
    px = np.frombuffer(row["pixels"], np.uint8).reshape(8, 8, 3)
    assert np.array_equal(px[:, :, 0], idx)
    assert np.array_equal(px[:, :, 2], 255 - idx)


def test_random_projection_preserves_distances_jl(spark):
    import numpy as np

    from us_dot_flights_lakehouse_spark.llm.similarity import random_project

    # 5 far-apart centers, 2 near-identical members each: true pairwise
    # distances are bimodal (tiny intra-cluster, huge inter-cluster) —
    # the structure JL provably preserves. (On isotropic gaussians all
    # distances concentrate at sqrt(2*dim), so rank tests are noise.)
    rng = np.random.default_rng(3)
    centers = rng.normal(size=(5, 64)) * 10
    vecs = np.stack([c + rng.normal(size=64) * 0.05 for c in centers for _ in range(2)])
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    proj = {
        r["id"]: np.array(r["proj"])
        for r in random_project(emb, out_dim=16, dim=64).collect()
    }
    assert all(len(p) == 16 for p in proj.values())
    intra = [np.linalg.norm(proj[2 * c] - proj[2 * c + 1]) for c in range(5)]
    inter = [
        np.linalg.norm(proj[a] - proj[b])
        for a in range(10)
        for b in range(a + 1, 10)
        if a // 2 != b // 2
    ]
    assert max(intra) < min(inter)


def test_mp4_mjpeg_roundtrip_and_frame_sampling(spark):
    import numpy as np

    g = 2 * ((5 * 3 + 29 * np.arange(6)) % 128)
    frames = np.repeat(g.astype(np.uint8)[:, None, None], 64, axis=1).reshape(6, 8, 8)
    blob = multimodal.mp4_encode_mjpeg(frames, frame_ms=40)

    # the header-metadata kernel still reads the same file
    meta = multimodal.mp4_meta(
        spark.createDataFrame([(1, bytearray(blob))], "id long, payload binary")
    ).collect()[0]
    assert meta["major_brand"] == "isom"
    assert meta["timescale"] == 1000 and meta["duration_ms"] == 240

    period, w, h, codec, samples = multimodal.mp4_parse_frames(blob)
    assert (period, w, h, codec, len(samples)) == (40, 8, 8, "jpeg", 6)

    df = spark.createDataFrame([(9, bytearray(blob))], "id long, payload binary")
    rows = multimodal.sample_frames(df, every_ms=80).orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]
    assert [r["ts_ms"] for r in rows] == [0, 80, 160]
    for r in rows:
        px = np.frombuffer(r["pixels"], np.uint8)
        assert (r["width"], r["height"], r["mode"]) == (8, 8, "L")
        assert px.min() == px.max() == g[r["frame_idx"]]


def test_mp4_non_jpeg_samples_gate_to_null_row(spark):
    import numpy as np

    frames = np.zeros((2, 8, 8), np.uint8)
    blob = bytearray(multimodal.mp4_encode_mjpeg(frames, frame_ms=40))
    # corrupt both samples' SOI markers so they read as a foreign codec
    soi = bytes(blob).find(b"\xff\xd8")
    while soi != -1:
        blob[soi : soi + 2] = b"\x00\x00"
        soi = bytes(blob).find(b"\xff\xd8")
    df = spark.createDataFrame([(1, blob)], "id long, payload binary")
    rows = multimodal.sample_frames(df, every_ms=40).collect()
    assert len(rows) == 1 and rows[0]["pixels"] is None
    with pytest.raises(ValueError):
        multimodal.mp4_parse_frames(b"\x00\x00\x00\x08free")


def test_hard_negatives_excludes_same_label(spark):
    from us_dot_flights_lakehouse_spark.llm.similarity import hard_negatives

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),
            (1, [1.0, 0.0], 0),   # identical but same label -> excluded
            (2, [0.9, 0.1], 1),   # hardest valid negative
            (3, [0.0, 1.0], 1),
            (4, [0.8, 0.2], 0),   # same label -> excluded
        ],
        "vec_id long, embedding array<double>, label int",
    )
    qs = emb.filter("vec_id = 0")
    rows = hard_negatives(emb, qs, k=2).collect()
    assert [(r["rank"], r["neighbor_id"], r["neighbor_label"]) for r in rows] == [
        (1, 2, 1),
        (2, 3, 1),
    ]


def test_resize_image_nearest_box_and_null_rows(spark):
    import numpy as np

    from us_dot_flights_lakehouse_spark.llm.multimodal import resize_image

    # 4x4 L gradient 0..15, plus an RGB 2x2, plus a codec-gated null row
    l_px = bytes(range(16))
    rgb_px = bytes(range(12))
    df = spark.createDataFrame(
        [
            (1, 4, 4, "L", bytearray(l_px)),
            (2, 2, 2, "RGB", bytearray(rgb_px)),
            (3, None, None, None, None),
        ],
        "id long, width int, height int, mode string, pixels binary",
    )
    box = {r["id"]: r for r in resize_image(df.filter("id = 1"), 2, 2, "box").collect()}
    # 2x2 block means of [[0..3],[4..7],[8..11],[12..15]]: (0+1+4+5)//4=2 etc
    assert list(box[1]["pixels"]) == [2, 4, 10, 12]
    near = {r["id"]: r for r in resize_image(df, 2, 2, "nearest").collect()}
    # nearest 4->2 picks rows/cols 0 and 2: values 0,2,8,10
    assert list(near[1]["pixels"]) == [0, 2, 8, 10]
    # RGB 2x2 -> 2x2 is identity; channels preserved
    assert list(near[2]["pixels"]) == list(rgb_px)
    assert near[2]["mode"] == "RGB"
    # null pixel row passes through as a null row
    assert near[3]["pixels"] is None and near[3]["width"] is None
    # nearest upscale 2->4 replicates each pixel 2x2
    up = resize_image(df.filter("id = 1"), 8, 8, "nearest").collect()[0]
    a = np.frombuffer(up["pixels"], np.uint8).reshape(8, 8)
    assert a[0, 0] == a[1, 1] == 0 and a[7, 7] == 15


def test_vocab_ids_and_token_encoding(spark):
    from us_dot_flights_lakehouse_spark.llm.tokenizer import (
        encode_token_ids,
        vocab_ids,
    )

    docs = _docs(spark, [(1, "b a b"), (2, "a c b")])
    vocab = vocab_ids(docs)
    # freq ranking: b x3 -> 0, a x2 -> 1, c x1 -> 2
    assert {(r["word"], r["token_id"]) for r in vocab.collect()} == {
        ("b", 0), ("a", 1), ("c", 2)
    }
    enc = {r["doc_id"]: r for r in encode_token_ids(docs, vocab).collect()}
    assert enc[1]["token_ids"] == [0, 1, 0] and enc[1]["n_tokens"] == 3
    assert enc[2]["token_ids"] == [1, 2, 0]
    # out-of-vocabulary tokens encode as -1
    oov = encode_token_ids(_docs(spark, [(3, "a zz")]), vocab).collect()[0]
    assert oov["token_ids"] == [1, -1]


def test_unicode_normalize_nfc_composition(spark):
    from us_dot_flights_lakehouse_spark.llm.textstats import unicode_normalize

    decomposed = "café naive"        # e + combining acute
    composed = "café naive"
    docs = _docs(spark, [(1, decomposed), (2, composed), (3, None)])
    rows = {r["doc_id"]: r for r in unicode_normalize(docs).collect()}
    assert rows[1]["norm_text"] == composed
    assert rows[1]["changed"] is True and rows[1]["len_delta"] == -1
    assert rows[2]["changed"] is False and rows[2]["len_delta"] == 0
    assert rows[3]["norm_text"] is None
    # NFKD decomposes compatibility chars like the ligature
    nfkd = unicode_normalize(_docs(spark, [(1, "ﬁsh")]), form="NFKD").collect()[0]
    assert nfkd["norm_text"] == "fish"


def test_html_to_text_extraction_rules(spark):
    from us_dot_flights_lakehouse_spark.llm.textstats import html_to_text

    cases = [
        (1, "<p>hello <b>world</b></p>", "hello world"),
        (2, "<script>if (a<b) { x('<p>'); }</script>real", "real"),
        (3, "<style>p>span { }</style>text", "text"),
        (4, "a<!-- <b>no</b> -->b", "a b"),
        (5, "x &amp;lt;raw&amp;gt; &amp; &lt;tag&gt;", "x &lt;raw&gt; & <tag>"),
        (6, "  lots\n\tof\r\n  space  ", "lots of space"),
    ]
    df = spark.createDataFrame([(i, h) for i, h, _ in cases], "id long, html string")
    got = {r["id"]: r["t"] for r in df.select("id", html_to_text("html").alias("t")).collect()}
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)


def test_kmeans_fit_recovers_planted_clusters(spark):
    import numpy as np

    from us_dot_flights_lakehouse_spark.llm.similarity import kmeans_fit

    rng = np.random.default_rng(7)
    centers = np.array([[10.0, 0.0, 0.0], [0.0, 10.0, 0.0], [0.0, 0.0, 10.0]])
    rows = []
    for i in range(300):
        c = i % 3
        rows.append((i, (centers[c] + rng.normal(0, 0.3, 3)).tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents, assign = kmeans_fit(emb, k=3, iters=4)
    got = {r["id"]: r["cell"] for r in assign.collect()}
    # every member of a planted cluster lands in the same learned cell,
    # and the three planted clusters map to three distinct cells
    cells = [{got[i] for i in range(300) if i % 3 == c} for c in range(3)]
    assert all(len(s) == 1 for s in cells)
    assert len({next(iter(s)) for s in cells}) == 3
    # learned centroids sit on the planted centers (noise sigma 0.3)
    recovered = sorted(np.round(cents.max(axis=1)).astype(int).tolist())
    assert recovered == [10, 10, 10]


def test_crop_image_window_and_gating(spark):
    import numpy as np

    from us_dot_flights_lakehouse_spark.llm.multimodal import crop_image

    l_px = bytes(range(16))  # 4x4 gradient
    df = spark.createDataFrame(
        [
            (1, 4, 4, "L", bytearray(l_px)),
            (2, 2, 2, "L", bytearray(bytes(4))),  # too small for the window
            (3, None, None, None, None),
        ],
        "id long, width int, height int, mode string, pixels binary",
    )
    out = {r["id"]: r for r in crop_image(df, 1, 2, 2, 2).collect()}
    # rows y=2..3, x=1..2 of [[0..3],[4..7],[8..11],[12..15]]
    assert list(out[1]["pixels"]) == [9, 10, 13, 14]
    assert (out[1]["width"], out[1]["height"]) == (2, 2)
    assert out[2]["pixels"] is None  # window exceeds image
    assert out[3]["pixels"] is None  # codec-gated input passes through


def test_containment_catches_subset_doc_jaccard_misses(spark):
    from us_dot_flights_lakehouse_spark.llm.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    long = " ".join(f"w{i}" for i in range(60))
    subset = " ".join(f"w{i}" for i in range(12))  # strict prefix of long
    docs = _docs(spark, [(1, long), (2, subset)])
    cont = containment_pairs(docs, threshold=0.9).collect()
    # every shingle of the prefix appears in the long doc -> containment 1.0
    assert [(r["doc_id_a"], r["doc_id_b"]) for r in cont] == [(1, 2)]
    assert cont[0]["containment"] == 1.0
    # symmetric Jaccard on the same pair is ~10/58 — far below 0.9
    assert ngram_jaccard_pairs(docs, threshold=0.9).collect() == []


def test_transform_image_orientations(spark):
    import numpy as np

    from us_dot_flights_lakehouse_spark.llm.multimodal import transform_image

    # 2x3 L image [[0,1,2],[3,4,5]]
    df = spark.createDataFrame(
        [(1, 3, 2, "L", bytearray(bytes(range(6)))), (2, None, None, None, None)],
        "id long, width int, height int, mode string, pixels binary",
    )
    lr = transform_image(df, "flip_lr").collect()
    got = {r["id"]: r for r in lr}
    assert list(got[1]["pixels"]) == [2, 1, 0, 5, 4, 3]
    assert got[2]["pixels"] is None
    ud = {r["id"]: r for r in transform_image(df, "flip_ud").collect()}
    assert list(ud[1]["pixels"]) == [3, 4, 5, 0, 1, 2]
    rot = {r["id"]: r for r in transform_image(df, "rot90").collect()}
    # numpy rot90 CCW of [[0,1,2],[3,4,5]] -> [[2,5],[1,4],[0,3]], 2x3 -> w=2,h=3
    assert (rot[1]["width"], rot[1]["height"]) == (2, 3)
    assert list(rot[1]["pixels"]) == [2, 5, 1, 4, 0, 3]


def test_patchify_stats_grid_and_gating(spark):
    from us_dot_flights_lakehouse_spark.llm.multimodal import patchify_stats

    # 4x4 L gradient 0..15, patch=2 -> 2x2 grid of 2x2 tiles
    df = spark.createDataFrame(
        [
            (1, 4, 4, "L", bytearray(bytes(range(16)))),
            (2, 3, 3, "L", bytearray(bytes(9))),  # not divisible by patch
            (3, None, None, None, None),
        ],
        "id long, width int, height int, mode string, pixels binary",
    )
    rows = patchify_stats(df, patch=2).collect()
    got = {(r["id"], r["patch_row"], r["patch_col"]): r for r in rows}
    # tile (0,0) = [[0,1],[4,5]] -> mean 2.5, min 0, max 5
    r00 = got[(1, 0, 0)]
    assert (r00["p_mean"], r00["p_min"], r00["p_max"]) == (2.5, 0, 5)
    # tile (1,1) = [[10,11],[14,15]] -> mean 12.5
    r11 = got[(1, 1, 1)]
    assert (r11["p_mean"], r11["p_min"], r11["p_max"]) == (12.5, 10, 15)
    assert len([k for k in got if k[0] == 1]) == 4
    # gated inputs yield exactly one null row each
    assert got[(2, None, None)]["p_mean"] is None
    assert got[(3, None, None)]["p_mean"] is None


def test_patchify_grayscales_multichannel(spark):
    from us_dot_flights_lakehouse_spark.llm.multimodal import patchify_stats

    # 2x2 RGB where each pixel's channels are (v, v+3, v+6) -> gray v+3
    px = bytes([0, 3, 6, 9, 12, 15, 18, 21, 24, 27, 30, 33])
    df = spark.createDataFrame(
        [(1, 2, 2, "RGB", bytearray(px))],
        "id long, width int, height int, mode string, pixels binary",
    )
    r = patchify_stats(df, patch=2).collect()[0]
    # gray = [[3,12],[21,30]] -> mean 16.5
    assert (r["p_mean"], r["p_min"], r["p_max"]) == (16.5, 3, 30)


def test_channel_sums_exact_moments(spark):
    from us_dot_flights_lakehouse_spark.llm.multimodal import channel_sums

    # 1x2 RGB: pixels (1,2,3) and (4,5,6)
    df = spark.createDataFrame(
        [
            (1, 2, 1, "RGB", bytearray(bytes([1, 2, 3, 4, 5, 6]))),
            (2, None, None, None, None),
        ],
        "id long, width int, height int, mode string, pixels binary",
    )
    rows = {(r["id"], r["channel"]): r for r in channel_sums(df).collect()}
    r0 = rows[(1, 0)]
    assert (r0["n_pixels"], r0["psum"], r0["psumsq"]) == (2, 5, 17)  # 1+4, 1+16
    r2 = rows[(1, 2)]
    assert (r2["n_pixels"], r2["psum"], r2["psumsq"]) == (2, 9, 45)  # 3+6, 9+36
    assert rows[(2, None)]["psum"] is None


def test_exact_substr_spans_finds_planted_boilerplate(spark):
    """A K-token boilerplate span shared by two docs is found with exact
    boundaries; the unique remainder is not flagged; a doc with no
    shared span yields no rows."""
    from us_dot_flights_lakehouse_spark.llm.dedup import exact_substr_spans

    boiler = "all rights reserved contact us for licensing terms"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta gamma {boiler} delta"),
            (2, f"{boiler} epsilon zeta"),
            (3, "totally unique words nothing shared here at all ok"),
        ],
        "doc_id long, text string",
    )
    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"])
        for r in exact_substr_spans(docs, k=6).collect()
    }
    # doc 1: boiler occupies tokens 4..11; doc 2: tokens 1..8
    assert spans == {1: (4, 11), 2: (1, 8)}


def test_exact_substr_spans_merges_chained_seeds(spark):
    """Two overlapping shared windows (gap <= k) merge into ONE maximal
    island instead of two fragments."""
    from us_dot_flights_lakehouse_spark.llm.dedup import exact_substr_spans

    shared = "a b c d e f g h i j"  # 10 tokens: many chained 6-windows
    docs = spark.createDataFrame(
        [(1, f"x {shared} y"), (2, f"p q {shared}")],
        "doc_id long, text string",
    )
    rows = exact_substr_spans(docs, k=6).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    assert per_doc[1] == [(2, 11)]
    assert per_doc[2] == [(3, 12)]


def test_exact_substr_apply_strips_only_covered_tokens(spark):
    """Cleaned text keeps original order, drops exactly the span tokens;
    a fully-duplicated doc comes back empty (kept_tokens=0)."""
    from us_dot_flights_lakehouse_spark.llm.dedup import exact_substr_apply

    boiler = "one two three four five six"
    docs = spark.createDataFrame(
        [
            (1, f"keepA {boiler} keepB"),
            (2, f"{boiler}"),
            (3, "no duplicate content in this document at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in exact_substr_apply(docs, k=6).collect()}
    assert out[1]["clean_text"] == "keepA keepB"
    assert (out[1]["kept_tokens"], out[1]["removed_tokens"]) == (2, 6)
    assert out[2]["clean_text"] == "" and out[2]["kept_tokens"] == 0
    assert out[3]["clean_text"] == docs.collect()[2]["text"]
    assert out[3]["removed_tokens"] == 0


def test_strip_ancillary_chunks_drops_only_metadata(spark):
    """The PNG metadata scrub drops every ancillary chunk (spec bit 5),
    keeps critical chunks byte-exact, and reports savings; a PNG with no
    metadata passes through untouched."""
    import hashlib
    import struct
    import zlib

    import numpy as np

    from us_dot_flights_lakehouse_spark.llm.multimodal import (
        png_decode,
        png_encode,
        strip_ancillary_chunks,
    )

    def chunk(typ, body):
        return (
            struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    base = png_encode(np.arange(64, dtype=np.uint8).reshape(8, 8), "L")
    dirty = (
        base[:33]
        + chunk(b"tEXt", b"Author\x00someone")
        + chunk(b"tIME", bytes(7))
        + base[33:]
    )
    df = spark.createDataFrame(
        [(1, bytearray(dirty)), (2, bytearray(base))], "id long, payload binary"
    )
    out = {r["id"]: r for r in strip_ancillary_chunks(df).collect()}
    assert bytes(out[1]["clean"]) == base  # byte-exact canonical result
    assert out[1]["dropped_csv"] == "tEXt,tIME"
    assert out[1]["bytes_saved"] == len(dirty) - len(base)
    assert out[2]["n_dropped"] == 0 and bytes(out[2]["clean"]) == base
    # pixels survive the scrub
    w, h, mode, px = png_decode(bytes(out[1]["clean"]))
    assert (w, h, mode) == (8, 8, "L") and px.ravel()[5] == 5
    assert hashlib.md5(bytes(out[1]["clean"])).hexdigest() == hashlib.md5(base).hexdigest()


def test_kcenter_oversample_matches_greedy_on_planted_clusters(spark):
    """k-means||-style oversampled k-center must recover one center per
    planted blob and land within 2x of the sequential Gonzalez greedy's
    coverage radius (on well-separated blobs both should be near-equal)."""
    import numpy as np

    from us_dot_flights_lakehouse_spark.llm.similarity import kcenter_oversample

    K, PER, DIM = 6, 12, 8
    rows, blobs = [], {}
    vid = 0
    for b in range(K):
        center = np.zeros(DIM)
        center[b % DIM] = 1000.0 * (b + 1)
        for j in range(PER):
            jitter = np.array([((vid * 31 + d * 17 + j * 7) % 11) - 5 for d in range(DIM)], dtype=float)
            vec = center + 0.1 * jitter
            rows.append((vid, [float(x) for x in vec]))
            blobs[vid] = b
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    sel = kcenter_oversample(emb, k=K)
    assert len(sel) == K
    assert {blobs[i] for i in sel} == set(range(K))  # one center per blob

    # coverage radius vs sequential greedy over the full set
    X = np.stack([np.asarray(v) for _, v in rows])
    ids = np.array([i for i, _ in rows])

    def radius(chosen_ids):
        C = X[np.isin(ids, chosen_ids)]
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).min(axis=1)
        return float(d.max())

    greedy = [0]
    mind = ((X - X[0]) ** 2).sum(axis=1)
    while len(greedy) < K:
        nxt = int(np.argmax(mind))
        greedy.append(nxt)
        mind = np.minimum(mind, ((X - X[nxt]) ** 2).sum(axis=1))
    assert radius(sel) <= 2.0 * radius([int(ids[i]) for i in greedy])


def test_frame_cuts_planted_boundary_and_null_contract(spark):
    """frame_cuts flags exactly the planted scene boundary and emits the
    null-metric row for undecodable payloads."""
    import numpy as np

    from us_dot_flights_lakehouse_spark.llm.multimodal import (
        avi_encode,
        frame_cuts,
    )

    f = np.arange(4)[:, None]
    g = (10 + 7 * f + 3 * np.arange(16)[None, :] + 90 * (f >= 2)).astype(
        np.uint8
    )
    frames = np.repeat(g.reshape(4, 4, 4, 1), 3, axis=3)
    blob = avi_encode(frames, us_per_frame=40_000)
    df = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(b"not a video"))],
        "id long, payload binary",
    )
    rows = frame_cuts(df, every_ms=40, threshold=1000).collect()
    by = {(r["id"], r["pair_idx"]): r for r in rows}
    # video 1: pairs 0..2, boundary at pair 1 (frames 1->2)
    assert by[(1, 0)]["diff_total"] == 48 * 7 and not by[(1, 0)]["is_cut"]
    assert by[(1, 1)]["diff_total"] == 48 * 97 and by[(1, 1)]["is_cut"]
    assert by[(1, 2)]["diff_total"] == 48 * 7 and not by[(1, 2)]["is_cut"]
    # invalid payload -> one visible null row
    assert by[(2, None)]["diff_total"] is None and by[(2, None)]["is_cut"] is None
