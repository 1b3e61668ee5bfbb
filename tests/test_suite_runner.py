"""Suite runner (genomicsbench_tpu/suite.py) — the run-cpu.sh/run-gpu.sh
analog.  Full 12-workload coverage lives in the demo itself; here a fast
subset proves dataset synthesis + CLI dispatch + timing report."""

from genomicsbench_tpu.suite import make_demo_dataset, run_suite


def test_make_demo_dataset_covers_all_workloads(tmp_path):
    jobs = make_demo_dataset(str(tmp_path))
    assert set(jobs) == {
        "bsw", "fmi", "chain", "phmm", "poa", "kmer-cnt", "pileup", "dbg",
        "grm", "eventalign", "nn-base", "nn-variant",
    }


def test_run_suite_subset(tmp_path):
    times = run_suite(str(tmp_path), only=["pileup", "grm", "chain"])
    assert set(times) == {"pileup", "grm", "chain"}
    assert all(t > 0 for t in times.values())
