"""f5c call-methylation (ops/methylation.py) vs reference semantics.

References: hmm.c:305-527 (profile HMM fill), 21-53 (ACGMT ranks),
132-229 (flanks), 231-299 (transitions); meth.c:359-430
(methylate/rc-meth), 501-659 (per-read calling)."""

import numpy as np
import pytest

from genomicsbench_tpu.ops import methylation as me


def test_sequence_rewriting():
    assert me.methylate("ACGTCGCG") == "AMGTMGMG"
    assert me.disambiguate("acgNt") == "ACGAT"
    # MG sites survive RC as MG; plain bases reverse-complement
    assert me.reverse_complement_meth("AMGT") == "AMGT"[::-1].translate(
        str.maketrans("AMGT", "T??A")
    ) or me.reverse_complement_meth("AMGT") == "AMGT"  # palindromic-ish check
    rc = me.reverse_complement_meth("TTMGAA")
    assert "MG" in rc and rc.startswith("TT")
    # rank order A C G M T (hmm.c:21-37)
    assert me.meth_kmer_rank("AAAAAM", 0) == 3
    assert me.meth_kmer_rank("AAAAAT", 0) == 4
    assert me.meth_kmer_rank("CAAAAA", 0) == 5**5


def _instance(rng, n_kmers=24, n_events=40, epb=1.6):
    ranks = rng.integers(0, me.NUM_KMER_METH, n_kmers).astype(np.int32)
    ev = rng.normal(90, 10, n_events).astype(np.float32)
    return dict(kmer_ranks=ranks, event_means=ev, scale=1.02, shift=3.1,
                var=1.1, events_per_base=epb)


def test_kernel_matches_f32_oracle():
    model_mean, model_stdv = me.synthetic_cpg_model()
    rng = np.random.default_rng(0)
    instances = [_instance(rng, nk, ne) for nk, ne in
                 ((24, 40), (10, 15), (31, 64), (24, 24))]
    got = me.profile_hmm_score_batch(instances, model_mean, model_stdv)
    for g, inst in zip(got, instances):
        want32 = me.profile_hmm_score_oracle(
            inst["kmer_ranks"], inst["event_means"], inst["scale"],
            inst["shift"], inst["var"], model_mean, model_stdv,
            inst["events_per_base"], dtype=np.float32,
        )
        want64 = me.profile_hmm_score_oracle(
            inst["kmer_ranks"], inst["event_means"], inst["scale"],
            inst["shift"], inst["var"], model_mean, model_stdv,
            inst["events_per_base"], dtype=np.float64,
        )
        assert g == pytest.approx(want32, rel=2e-4, abs=2e-3)
        assert want32 == pytest.approx(want64, rel=1e-3, abs=5e-2)


def test_forward_scores_true_sequence_higher():
    """Events synthesized from a known k-mer path must score higher for the
    generating sequence than for a random one."""
    model_mean, model_stdv = me.synthetic_cpg_model()
    rng = np.random.default_rng(1)
    seq = "".join(rng.choice(list("ACGT"), 40))
    ranks = me.meth_kmer_ranks(seq, seq, rc=False)
    ev = (model_mean[ranks] + rng.normal(0, 0.5, len(ranks))).astype(np.float32)
    true_inst = dict(kmer_ranks=ranks, event_means=ev, scale=1.0, shift=0.0,
                     var=1.0, events_per_base=1.1)
    other = "".join(rng.choice(list("ACGT"), 40))
    fake_inst = dict(true_inst, kmer_ranks=me.meth_kmer_ranks(other, other, rc=False))
    s = me.profile_hmm_score_batch([true_inst, fake_inst], model_mean, model_stdv)
    assert s[0] > s[1] + 50


def test_call_methylation_discriminates():
    """Reads generated from the methylated model must get positive
    ll_ratio; unmethylated reads negative."""
    model_mean, model_stdv = me.synthetic_cpg_model()
    rng = np.random.default_rng(2)
    left = "".join(rng.choice(list("ACT"), 25))   # no CG outside the site
    right = "".join(rng.choice(list("ACT"), 25))
    ref = left + "CG" + right
    ref_start = 0

    def synth(meth):
        seq = me.methylate(ref) if meth else ref
        ranks = me.meth_kmer_ranks(seq, seq, rc=False)
        ev = (model_mean[ranks] + rng.normal(0, 0.4, len(ranks))).astype(np.float32)
        # one event per kmer, aligned 1:1 to reference positions
        aln_ref = np.arange(len(ranks)) + ref_start
        aln_ev = np.arange(len(ranks))
        return ev, aln_ref, aln_ev

    for meth in (False, True):
        ev, aref, aev = synth(meth)
        sites = me.call_methylation_for_read(
            ref, ref_start, aref, aev, ev, (1.0, 0.0, 1.0),
            model_mean, model_stdv, events_per_base=1.1,
        )
        assert sites, "no CpG group scored"
        ss = list(sites.values())[0]
        assert ss.n_cpg == 1
        if meth:
            assert ss.ll_ratio > 3
        else:
            assert ss.ll_ratio < -3


def test_methylation_frequency_aggregation():
    mk = lambda r: {100: me.ScoredSite(100, 100, 1, "SEQ", 0.0, r)}
    maps = [mk(5.0), mk(4.0), mk(-6.0), mk(1.0)]  # 2 meth, 1 unmeth, 1 ambiguous
    out = me.methylation_frequency(maps, call_threshold=2.5)
    assert len(out) == 1
    rec = out[0]
    assert rec["called_sites"] == 3
    assert rec["called_sites_methylated"] == 2
    assert rec["methylated_frequency"] == pytest.approx(2 / 3)


def test_call_methylation_reversed_event_order():
    """rc reads map events in DESCENDING order (event_stride=-1,
    hmm.c:318-332): find_event_bounds yields e1 > e2 and the caller must
    feed the HMM the stride-reversed event rows."""
    model_mean, model_stdv = me.synthetic_cpg_model()
    rng = np.random.default_rng(5)
    left = "".join(rng.choice(list("ACT"), 25))
    right = "".join(rng.choice(list("ACT"), 25))
    ref = left + "CG" + right
    seq = me.methylate(ref)
    ranks = me.meth_kmer_ranks(seq, seq, rc=False)
    ev_fwd = (model_mean[ranks] + rng.normal(0, 0.4, len(ranks))).astype(np.float32)
    # store events in REVERSED order; alignment maps ref pos k -> event n-1-k
    ev_store = ev_fwd[::-1].copy()
    n = len(ranks)
    aln_ref = np.arange(n)
    aln_ev = (n - 1) - np.arange(n)
    sites = me.call_methylation_for_read(
        ref, 0, aln_ref, aln_ev, ev_store, (1.0, 0.0, 1.0),
        model_mean, model_stdv, events_per_base=1.1,
    )
    assert sites, "no sites scored on the reversed-order path"
    ss = list(sites.values())[0]
    assert ss.ll_ratio > 3  # methylated read -> positive ratio

    # same call with forward order must agree (same event set)
    sites_f = me.call_methylation_for_read(
        ref, 0, aln_ref, np.arange(n), ev_fwd, (1.0, 0.0, 1.0),
        model_mean, model_stdv, events_per_base=1.1,
    )
    f = list(sites_f.values())[0]
    assert abs(f.ll_ratio - ss.ll_ratio) < 1e-3
