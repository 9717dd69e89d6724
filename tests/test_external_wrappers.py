"""External-tool wrappers: command-line construction validated against
fake recording binaries (no PLINK/Beagle/liftOver in this environment)."""

import os
import stat
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from bigsnpr_tpu.utils.external import (
    snp_plinkQC, snp_plinkKINGQC, snp_plinkRmSamples, snp_modifyBuild,
    download_plink,
)


@pytest.fixture()
def fake_bin(tmp_path):
    """A fake executable that records its argv and creates --out files."""
    log = tmp_path / "calls.log"
    script = tmp_path / "plink"
    script.write_text(f"""#!/bin/bash
echo "$@" >> {log}
out=""
prev=""
for a in "$@"; do
  if [ "$prev" == "--out" ]; then out="$a"; fi
  prev="$a"
done
if [ -n "$out" ]; then touch "$out.bed" "$out.bim" "$out.fam" "$out.kin0"; fi
exit 0
""")
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    return script, log


def test_plink_qc_command(fake_bin, tmp_path):
    plink, log = fake_bin
    out = snp_plinkQC(plink, str(tmp_path / "data"), maf=0.05, geno=0.2,
                      mind=0.3, hwe=1e-10, autosome_only=True)
    call = log.read_text().strip()
    # reference command line (R/external-software.R:272-284)
    for frag in ["--bfile", "--maf 0.05", "--mind 0.3", "--geno 0.2",
                 "--hwe 1e-10", "--autosome", "--make-bed", "--out"]:
        assert frag in call, (frag, call)
    assert out.endswith("_QC.bed")


def test_plink_rm_samples(fake_bin, tmp_path):
    plink, log = fake_bin
    df = pd.DataFrame({"FID": ["F1", "F2"], "IID": ["S1", "S2"]})
    out = snp_plinkRmSamples(plink, tmp_path / "in.bed", tmp_path / "out.bed",
                             df)
    call = log.read_text().strip()
    assert "--remove" in call and "--make-bed" in call
    assert str(out).endswith("out.bed")


def test_king_qc(fake_bin, tmp_path):
    plink2, log = fake_bin
    out = snp_plinkKINGQC(plink2, tmp_path / "in.bed")
    call = log.read_text()
    assert "--king-cutoff" in call and "--make-bed" in call
    assert out.endswith("_norel.bed")
    # table mode (fake kin0 is empty; only the command matters here)
    log.write_text("")
    import pandas.errors

    try:
        snp_plinkKINGQC(plink2, tmp_path / "in.bed", make_bed=False)
    except pandas.errors.EmptyDataError:
        pass
    assert "--make-king-table" in log.read_text()


def test_modify_build_with_fake_liftover(tmp_path):
    lift = tmp_path / "liftOver"
    # fake liftOver: shift every position by +1000, chr prefix preserved
    lift.write_text("""#!/bin/bash
bed="$1"; out="$3"; unmapped="$4"
awk '{printf "%s\\t%d\\t%d\\t%s\\n", $1, $2+1000, $3+1000, $4}' "$bed" > "$out"
touch "$unmapped"
""")
    lift.chmod(lift.stat().st_mode | stat.S_IEXEC)
    chain = tmp_path / "hg18ToHg19.over.chain.gz"
    chain.write_bytes(b"fake")
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        info = pd.DataFrame({"chr": [1, 1, 2], "pos": [1000, 5000, 700]})
        out = snp_modifyBuild(info, str(lift), from_build="hg18",
                              to_build="hg19")
        np.testing.assert_array_equal(out["pos"], [2000, 6000, 1700])
    finally:
        os.chdir(cwd)


def test_download_raises():
    with pytest.raises(RuntimeError, match="egress"):
        download_plink()
