"""Scale smoke for the v2f pipelines: a synthetic 120k-row corpus in the
reference's exact file layout, run through the full extraction pipeline
(all six outputs incl. the variants union+dedup), checking row counts and
the invariants that must hold at any scale."""

import glob
import json
import random

import pytest

from monster_etl_spark.plans.v2f import run_extraction_pipeline

N_PER_FILE = 5000
PHENOTYPES = ("CHOL", "Alb", "T2D")
ANCESTRIES = ("AA", "EA", "EU")


def _variant(rng, i):
    return f"{rng.randint(1, 22)}:{100000 + i}:{rng.choice('ACGT')}:{rng.choice('ACGT')}"


@pytest.fixture(scope="module")
def big_input(tmp_path_factory):
    root = tmp_path_factory.mktemp("v2f_big")
    rng = random.Random(7)
    uid = 0

    def freq_rows(n):
        nonlocal uid
        out = []
        for _ in range(n):
            uid += 1
            v = _variant(rng, uid)
            c, p, r, a = v.split(":")
            eaf = "" if rng.random() < 0.1 else f"{rng.random():.4f}"
            out.append(f"{v}\t{c}\t{p}\t{r}\t{a}\t{eaf}\t{rng.random():.4f}")
        return out

    for ph in PHENOTYPES:
        d = root / "frequency-analysis" / ph
        d.mkdir(parents=True)
        (d / "part-00000.csv").write_text(
            "varId\tchromosome\tposition\treference\talt\teaf\tmaf\n" + "\n".join(freq_rows(N_PER_FILE)) + "\n"
        )
        (d / "empty.csv").write_text("")

    for ph in PHENOTYPES[:2]:
        for anc in ANCESTRIES:
            d = root / "meta-analysis" / "ancestry-specific" / ph / f"ancestry={anc}"
            d.mkdir(parents=True)
            rows = []
            for _ in range(N_PER_FILE // 2):
                uid_local = rng.randint(1, uid)
                v = _variant(rng, uid_local)
                c, p, r, a = v.split(":")
                rows.append(
                    f"{v}\t{c}\t{p}\t{r}\t{a}\t{ph}\t{rng.random():.3e}\t{rng.uniform(-1, 1):.4f}\t{rng.random():.4f}\t{float(rng.randint(1000, 99999))}"
                )
            (d / "part-00000.csv").write_text(
                "varId\tchromosome\tposition\treference\talt\tphenotype\tpValue\tbeta\tstdErr\tn\n"
                + "\n".join(rows) + "\n"
            )

    for ph in PHENOTYPES:
        d = root / "meta-analysis" / "trans-ethnic" / ph
        d.mkdir(parents=True)
        rows = []
        for _ in range(N_PER_FILE):
            uid_local = rng.randint(1, uid)
            v = _variant(rng, uid_local)
            c, p, r, a = v.split(":")
            rows.append(
                f"{v}\t{c}\t{p}\t{r}\t{a}\t{ph}\t{rng.random():.3e}\t{rng.uniform(-1, 1):.4f}\t{rng.uniform(-5, 5):.4f}\t{rng.random():.4f}\t{float(rng.randint(1000, 99999))}\t{rng.choice(('true', 'false'))}"
            )
        (d / "part-00000.csv").write_text(
            "varId\tchromosome\tposition\treference\talt\tphenotype\tpValue\tbeta\tzScore\tstdErr\tn\ttop\n"
            + "\n".join(rows) + "\n"
        )

    # minimal variant-effect tables so all six sinks run
    for sub, hdr, row in (
        (
            "variant-effect/regulatory-feature-consequences",
            "id\tbiotype\tconsequence_terms\timpact\tpick\tregulatory_feature_id\tvariant_allele",
            "10:5338713:C:T\tenhancer\tregulatory_region_variant,TF_binding\tMODIFIER\t1\tENSR0001\tT",
        ),
        (
            "variant-effect/transcript-consequences",
            "id\tcadd_phred\tconsequence_terms\tstrand\tcanonical\tsift_score\tsiphy_29way_pi",
            "10:5338713:C:T\t1.5\tmissense\t-1\ttrue\t0.1,.\t0.5:0.25",
        ),
    ):
        d = root / sub
        d.mkdir(parents=True)
        (d / "part-00000.csv").write_text(hdr + "\n" + "\n".join([row] * 1000) + "\n")

    return str(root)


def test_scaled_extraction_pipeline(spark, big_input, tmp_path):
    out = str(tmp_path / "out")
    run_extraction_pipeline(spark, big_input, out)

    def count(table):
        n = 0
        for f in glob.glob(f"{out}/{table}/part-*"):
            with open(f) as fh:
                n += sum(1 for line in fh if line.strip())
        return n

    assert count("frequency-analysis") == 3 * N_PER_FILE
    assert count("meta-analysis/ancestry-specific") == 2 * 3 * (N_PER_FILE // 2)
    assert count("meta-analysis/trans-ethnic") == 3 * N_PER_FILE
    assert count("variant-effect/regulatory-feature-consequences") == 1000
    assert count("variant-effect/transcript-consequences") == 1000

    # variants: deduped by id, and id space bounded by generated uids
    variant_ids = []
    for f in glob.glob(f"{out}/variants/part-*"):
        with open(f) as fh:
            variant_ids += [json.loads(line)["id"] for line in fh if line.strip()]
    assert len(variant_ids) == len(set(variant_ids)), "variants must be unique by id"
    assert len(variant_ids) > 10000

    # spot invariants: typed fields + sparse nulls omitted
    sample = []
    for f in glob.glob(f"{out}/frequency-analysis/part-*"):
        with open(f) as fh:
            sample += [json.loads(line) for line in fh if line.strip()]
            if len(sample) > 1000:
                break
    assert any("eaf" not in r for r in sample), "empty eaf cells must be absent keys"
    assert all(isinstance(r.get("maf"), float) for r in sample)
    assert all("position" not in r for r in sample), "removed fields must not leak"
