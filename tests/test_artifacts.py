"""Artifact-cache protocol tests (no Spark needed): content-keyed paths and
atomic publication — the two safety properties from the round-3 advice."""

import os

from kafka_connect_storage_cloud_formats_spark.artifacts import (
    artifact_path,
    corpus_fingerprint,
    ensure_artifact,
)


def _fake_corpus(tmp_path, payload=b"v1"):
    (tmp_path / "documents.parquet").write_bytes(payload)
    return str(tmp_path)


def test_fingerprint_changes_when_corpus_regenerated(tmp_path):
    sf = _fake_corpus(tmp_path)
    fp1 = corpus_fingerprint(sf, "documents")
    p1 = artifact_path("x", sf, "documents")
    # same content → stable key
    assert corpus_fingerprint(sf, "documents") == fp1
    # regenerated corpus (different bytes ⇒ different size/mtime) → new key,
    # therefore a different cache path: stale reuse is impossible
    _fake_corpus(tmp_path, b"v2-regenerated")
    assert corpus_fingerprint(sf, "documents") != fp1
    assert artifact_path("x", sf, "documents") != p1


def test_ensure_artifact_publishes_atomically(tmp_path):
    target = str(tmp_path / "artifact")
    calls = []

    def build(tmp_dir):
        calls.append(tmp_dir)
        # builder writes into a PRIVATE tmp dir, never the target
        assert tmp_dir != target and tmp_dir.startswith(target + ".tmp.")
        os.makedirs(tmp_dir)
        open(os.path.join(tmp_dir, "part-0"), "w").write("data")
        open(os.path.join(tmp_dir, "_SUCCESS"), "w").close()

    assert ensure_artifact(target, build) == target
    assert os.path.exists(os.path.join(target, "_SUCCESS"))
    # cached: second call doesn't rebuild
    ensure_artifact(target, build)
    assert len(calls) == 1
    # force re-runs the build (what an index-build bench measures) but the
    # published artifact survives untouched
    before = os.stat(target).st_ino
    ensure_artifact(target, build, force=True)
    assert len(calls) == 2
    assert os.stat(target).st_ino == before
    assert open(os.path.join(target, "part-0")).read() == "data"
    # no tmp litter
    assert [p for p in os.listdir(str(tmp_path)) if ".tmp." in p] == []


def test_losing_concurrent_builder_discards_quietly(tmp_path):
    """Two builders race: the one whose publish loses must leave the
    winner's artifact untouched and clean up its own tmp dir. Simulated by
    a build fn that 'loses' — the target appears (winner publishes) while
    it is still writing."""
    target = str(tmp_path / "artifact")

    def winner_publishes_mid_build(tmp_dir):
        os.makedirs(tmp_dir)
        open(os.path.join(tmp_dir, "part-0"), "w").write("loser")
        open(os.path.join(tmp_dir, "_SUCCESS"), "w").close()
        # concurrent winner publishes first
        os.makedirs(target)
        open(os.path.join(target, "part-0"), "w").write("winner")
        open(os.path.join(target, "_SUCCESS"), "w").close()

    assert ensure_artifact(target, winner_publishes_mid_build) == target
    # winner's content survives; loser's bytes never reach the target
    assert open(os.path.join(target, "part-0")).read() == "winner"
    assert [p for p in os.listdir(str(tmp_path)) if ".tmp." in p] == []


def test_stale_blocking_directory_fails_loudly(tmp_path):
    """A directory squatting at the target WITHOUT a _SUCCESS marker (e.g.
    a manually-created or legacy-layout dir) blocks the atomic rename; the
    cache must raise rather than hand a reader the broken directory."""
    target = str(tmp_path / "artifact")
    os.makedirs(target)
    open(os.path.join(target, "junk"), "w").write("not an artifact")

    def build(tmp_dir):
        os.makedirs(tmp_dir)
        open(os.path.join(tmp_dir, "part-0"), "w").write("data")
        open(os.path.join(tmp_dir, "_SUCCESS"), "w").close()

    import pytest

    with pytest.raises(RuntimeError, match="_SUCCESS"):
        ensure_artifact(target, build)
    # and its own tmp dir is still cleaned up
    assert [p for p in os.listdir(str(tmp_path)) if ".tmp." in p] == []


def test_failed_build_leaves_no_partial_artifact(tmp_path):
    target = str(tmp_path / "artifact")

    def broken(tmp_dir):
        os.makedirs(tmp_dir)
        open(os.path.join(tmp_dir, "part-0"), "w").write("partial")
        raise RuntimeError("builder died mid-write")

    try:
        ensure_artifact(target, broken)
    except RuntimeError:
        pass
    # a reader can never observe the partial output
    assert not os.path.exists(target)
    assert [p for p in os.listdir(str(tmp_path)) if ".tmp." in p] == []


def test_publish_sweeps_stale_fingerprints(tmp_path, monkeypatch):
    """Regenerating the corpus must retire the previous fingerprint's
    artifact directory (and its tmp litter) on the next publish — the cache
    holds ONE generation per artifact kind, not one per regeneration.
    Companions with a different suffix (the IVF ``_centroids`` pair) and
    other kinds/params are never touched."""
    import tempfile as _tf

    from kafka_connect_storage_cloud_formats_spark import artifacts as _art

    monkeypatch.setattr(_tf, "gettempdir", lambda: str(tmp_path / "cache"))
    monkeypatch.setattr(_art, "SWEEP_GRACE_SECONDS", 0.0)
    os.makedirs(str(tmp_path / "cache"))
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    sf = _fake_corpus(corpus)

    def build(tmp_dir):
        os.makedirs(tmp_dir)
        open(os.path.join(tmp_dir, "_SUCCESS"), "w").close()

    p1 = artifact_path("sigs", sf, "documents", params="k12n3")
    ensure_artifact(p1, build)
    # same-fingerprint companion + other-kind sibling + old-fp tmp litter
    c1 = p1 + "_centroids"
    ensure_artifact(c1, build)
    other = artifact_path("ivf", sf, "documents", params="v1")
    ensure_artifact(other, build)
    os.makedirs(p1 + ".tmp.deadbeef", exist_ok=True)

    _fake_corpus(corpus, b"v2-regenerated")
    p2 = artifact_path("sigs", sf, "documents", params="k12n3")
    assert p2 != p1
    ensure_artifact(p2, build)
    assert os.path.exists(os.path.join(p2, "_SUCCESS"))
    assert not os.path.exists(p1), "stale fingerprint must be swept"
    assert not any(".tmp." in d for d in os.listdir(str(tmp_path / "cache")))
    # the centroids companion is swept only by ITS OWN publish, never by
    # the main directory's (different suffix)
    assert os.path.exists(c1)
    ensure_artifact(p2 + "_centroids", build)
    assert not os.path.exists(c1)
    # other artifact kinds are untouched
    assert os.path.exists(other)
    # cached re-ensure (no build) never sweeps nor rebuilds
    ensure_artifact(p2, build)
    assert os.path.exists(os.path.join(p2, "_SUCCESS"))


def test_sweep_grace_period_spares_young_siblings(tmp_path, monkeypatch):
    """A just-published previous-generation artifact is NOT swept while
    inside the grace window (a concurrent session may be mid-scan of it);
    once cold, the next publish retires it."""
    import tempfile as _tf

    from kafka_connect_storage_cloud_formats_spark import artifacts as _art

    monkeypatch.setattr(_tf, "gettempdir", lambda: str(tmp_path / "cache"))
    os.makedirs(str(tmp_path / "cache"))
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    sf = _fake_corpus(corpus)

    def build(tmp_dir):
        os.makedirs(tmp_dir)
        open(os.path.join(tmp_dir, "_SUCCESS"), "w").close()

    p1 = artifact_path("sigs", sf, "documents", params="g1")
    ensure_artifact(p1, build)
    _fake_corpus(corpus, b"v2-regenerated")
    p2 = artifact_path("sigs", sf, "documents", params="g1")
    # default grace (600 s): p1 is seconds old → spared
    ensure_artifact(p2, build)
    assert os.path.exists(p1), "young sibling must survive the grace window"
    # age p1 past the grace window → the NEXT publish retires it
    old = os.stat(p1).st_mtime - _art.SWEEP_GRACE_SECONDS - 1
    os.utime(p1, (old, old))
    _art._sweep_stale_siblings(p2)
    assert not os.path.exists(p1)
    assert os.path.exists(p2)


def test_path_hash_separates_same_basename_corpora(tmp_path, monkeypatch):
    """Two checkouts each with their own ``sf0.1`` are DIFFERENT artifact
    families (round-5 ADVICE): one corpus's publish must never treat the
    other's artifact as a stale generation of itself."""
    import tempfile as _tf

    from kafka_connect_storage_cloud_formats_spark import artifacts as _art

    monkeypatch.setattr(_tf, "gettempdir", lambda: str(tmp_path / "cache"))
    monkeypatch.setattr(_art, "SWEEP_GRACE_SECONDS", 0.0)
    os.makedirs(str(tmp_path / "cache"))
    a = tmp_path / "checkout_a" / "sf0.1"
    b = tmp_path / "checkout_b" / "sf0.1"
    a.mkdir(parents=True)
    b.mkdir(parents=True)
    sfa = _fake_corpus(a, b"corpus-a")
    sfb = _fake_corpus(b, b"corpus-b")
    pa = artifact_path("sigs", sfa, "documents", params="g1")
    pb = artifact_path("sigs", sfb, "documents", params="g1")
    assert pa != pb

    def build(tmp_dir):
        os.makedirs(tmp_dir)
        open(os.path.join(tmp_dir, "_SUCCESS"), "w").close()

    ensure_artifact(pa, build)
    ensure_artifact(pb, build)  # b's publish sweeps b-family only
    assert os.path.exists(pa), "other checkout's live artifact must survive"
    # but a REGENERATION of b itself still retires b's old generation
    _fake_corpus(b, b"corpus-b-regenerated")
    pb2 = artifact_path("sigs", sfb, "documents", params="g1")
    ensure_artifact(pb2, build)
    assert not os.path.exists(pb)
    assert os.path.exists(pa)


def test_interleaved_builders_never_expose_partial_artifact(tmp_path, monkeypatch):
    """Round-5 verdict ask #5: two interleaved ensure_artifact calls for the
    SAME content key — the loser's rename fails AFTER the winner published;
    no reader ever sees a partial artifact, the winner's content survives,
    and the winner's publish-sweep never deletes the winner itself."""
    import tempfile as _tf

    from kafka_connect_storage_cloud_formats_spark import artifacts as _art

    monkeypatch.setattr(_tf, "gettempdir", lambda: str(tmp_path / "cache"))
    monkeypatch.setattr(_art, "SWEEP_GRACE_SECONDS", 0.0)
    os.makedirs(str(tmp_path / "cache"))
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    sf = _fake_corpus(corpus)
    target = artifact_path("race", sf, "documents")

    def make(d, tag):
        os.makedirs(d)
        open(os.path.join(d, "part-0"), "w").write(tag)
        open(os.path.join(d, "_SUCCESS"), "w").close()

    real_rename = os.rename
    order = []

    def racing_rename(src, dst):
        # interleave: just before the loser's rename lands, the winner's
        # fully-built tmp dir is renamed into place first (atomic on one FS)
        if dst == target and not os.path.exists(target):
            wtmp = target + ".tmp.aaaaaaaa"
            make(wtmp, "winner")
            real_rename(wtmp, target)
            order.append("winner-published")
        order.append("loser-rename-attempt")
        return real_rename(src, dst)  # loser: dst exists → OSError

    monkeypatch.setattr(os, "rename", racing_rename)
    assert ensure_artifact(target, lambda d: make(d, "loser")) == target
    monkeypatch.setattr(os, "rename", real_rename)
    # the loser adjudicated the failed rename as a lost race (winner's
    # _SUCCESS present) — winner's content intact, loser's tmp cleaned up
    assert order[0] == "winner-published"
    assert open(os.path.join(target, "part-0")).read() == "winner"
    assert os.path.exists(os.path.join(target, "_SUCCESS"))
    assert [p for p in os.listdir(str(tmp_path / "cache")) if ".tmp." in p] == []
    # the sweep that follows a publish keyed on the SAME fingerprint never
    # removes the live winner
    _art._sweep_stale_siblings(target)
    assert os.path.exists(os.path.join(target, "_SUCCESS"))


def test_params_token_changes_the_key(tmp_path):
    """Same corpus, different derivation constants → different cache path:
    retuning K/shingle width can never silently serve the old artifact."""
    sf = _fake_corpus(tmp_path)
    assert artifact_path("sigs", sf, "documents", params="k12n3") != artifact_path(
        "sigs", sf, "documents", params="k16n3"
    )
    assert artifact_path("sigs", sf, "documents", params="k12n3") != artifact_path(
        "sigs", sf, "documents"
    )
