

def test_doc_sample_deterministic_uniform(spark):
    """doc_sample: deterministic (same rows every call), partitions the id
    space across buckets, and roughly uniform at mod=4."""
    from ocr_spark.operators import dedup as DD

    docs = spark.range(2000).selectExpr("id as doc_id", "'t' as text")
    a = {r["doc_id"] for r in DD.doc_sample(docs, mod=4, bucket=0).collect()}
    b = {r["doc_id"] for r in DD.doc_sample(docs, mod=4, bucket=0).collect()}
    assert a == b and a
    all_buckets = set()
    sizes = []
    for k in range(4):
        s = {r["doc_id"] for r in DD.doc_sample(docs, mod=4, bucket=k).collect()}
        assert not (s & all_buckets)
        all_buckets |= s
        sizes.append(len(s))
    assert all_buckets == set(range(2000))
    assert all(350 < n < 650 for n in sizes)  # uniform-ish at rate 1/4
