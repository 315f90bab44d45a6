"""Round-5 regression tests: host-identity-keyed XLA:CPU compile cache.

The round-4 MULTICHIP dryrun surfaced a "could lead to execution errors
such as SIGILL" warning: the persistent cache handed back an AOT
executable compiled on a different driver host.  The first fix keyed CPU
entries on the cpuinfo *flag set*; the warning recurred because LLVM
tuning features (prefer-no-scatter / prefer-no-gather) derive from the
CPU *model*, which two hosts can differ on while sharing a flag set.
The key now covers vendor / family / model / model name / stepping too.
"""

import os

from procedurevrl_tpu.utils.parser import compilation_cache_dir

CPUINFO_A = """\
processor\t: 0
vendor_id\t: GenuineIntel
cpu family\t: 6
model\t\t: 143
model name\t: Intel(R) Xeon(R) Platinum 8481C CPU @ 2.70GHz
stepping\t: 8
flags\t\t: fpu vme de pse avx2 avx512f amx-bf16
"""

# identical flag set, different model identity (the observed collision)
CPUINFO_B = CPUINFO_A.replace("143", "207").replace("8481C", "8581C")

# different flag ORDER only -> must hash identically (flags are sorted)
CPUINFO_A_REORDERED = CPUINFO_A.replace(
    "fpu vme de pse avx2 avx512f amx-bf16",
    "avx512f avx2 amx-bf16 fpu de pse vme",
)


def _dir_for(tmp_path, name, content):
    p = tmp_path / name
    p.write_text(content)
    return compilation_cache_dir(str(p))


def test_cache_key_separates_same_flags_different_model(tmp_path):
    a = _dir_for(tmp_path, "a", CPUINFO_A)
    b = _dir_for(tmp_path, "b", CPUINFO_B)
    assert a != b
    assert os.path.basename(a).startswith("cpu-")
    assert os.path.basename(b).startswith("cpu-")


def test_cache_key_stable_under_flag_reordering(tmp_path):
    a = _dir_for(tmp_path, "a", CPUINFO_A)
    a2 = _dir_for(tmp_path, "a2", CPUINFO_A_REORDERED)
    assert a == a2


def test_cache_key_missing_cpuinfo_still_returns_subdir(tmp_path):
    d = compilation_cache_dir(str(tmp_path / "nonexistent"))
    assert os.path.basename(d).startswith("cpu-")


def test_tpu_platform_uses_base_dir(monkeypatch):
    # on a non-cpu platform the base dir is returned untouched (entries
    # execute on the chip; re-keying would cold-start 10-25 min compiles)
    from procedurevrl_tpu.utils import parser as parser_mod

    monkeypatch.setattr(parser_mod, "_current_platform", lambda: "tpu")
    base = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
    assert compilation_cache_dir() == base
