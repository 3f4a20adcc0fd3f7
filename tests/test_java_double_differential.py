"""Differential fuzz: the FloatingDecimal port vs the live JVM.

``jsonvalue.double_canonical`` — the decimal every JSON float literal
is reduced to before ANY numeric keyword runs — is
``BigDecimal.valueOf(double)`` = ``new BigDecimal(Double.toString(d))``
on the reference's JDK 17, whose pre-Ryū rendering is NOT always the
shortest round-trip form (JDK-4511638; ``2^62`` prints 17 digits).
``core.javadouble`` ports that algorithm bytecode-faithfully, three
arithmetic tiers and wraparounds included; this test pins it to the
actual JVM over structured families (powers of two/ten, integers,
boundary neighborhoods, subnormals) plus random bit patterns.

The port matters for verdicts, not just messages: multipleOf /
min/max / const at the 17th significant digit flip with the digit
string (the fresh-seed expression sweep caught exactly such a flip).
"""

from __future__ import annotations

import random
import shutil
import struct
import subprocess

import pytest

from json_schema_spark.core.javadouble import java17_double_repr

JAVAC = shutil.which("javac")
JAVA = shutil.which("java")

pytestmark = pytest.mark.skipif(
    not (JAVAC and JAVA), reason="no JVM toolchain")


@pytest.fixture(scope="module")
def probe(tmp_path_factory):
    root = tmp_path_factory.mktemp("dblprobe")
    src = root / "DoubleProbe.java"
    src.write_text(
        (pytest.importorskip("pathlib").Path(__file__).parent
         / "javadiff" / "DoubleProbe.java").read_text())
    subprocess.run([JAVAC, "-d", str(root), str(src)],
                   check=True, capture_output=True)

    def run(bit_patterns):
        payload = "\n".join(f"{b:016x}" for b in bit_patterns)
        r = subprocess.run([JAVA, "-cp", str(root), "DoubleProbe"],
                           input=payload + "\n", capture_output=True,
                           text=True, check=True)
        out = r.stdout.splitlines()
        assert len(out) == len(bit_patterns), r.stderr[-1000:]
        return out

    return run


def _finite(b: int) -> bool:
    return (b >> 52) & 0x7FF != 0x7FF


def _bits(d: float) -> int:
    return struct.unpack(">Q", struct.pack(">d", d))[0]


def test_double_repr_matches_jvm(probe):
    rng = random.Random(0xD0B1E)
    bits: list[int] = [
        _bits(0.0), _bits(-0.0), 1, (1 << 63) | 1,  # zeros, min subnormal
        _bits(2.0 ** 62),  # the JDK-4511638 poster child
    ]
    for e in range(-1074, 1024):
        try:
            bits.append(_bits(2.0 ** e))
        except OverflowError:
            pass
    for e in range(-308, 309):
        bits.append(_bits(float(10.0 ** e)))
    for _ in range(3000):
        bits.append(_bits(float(rng.randint(0, 2 ** 64))))
    while len(bits) < 60000:
        b = rng.getrandbits(64)
        if _finite(b):
            bits.append(b)
    for b in list(bits[:2000]):
        for d in (-2, -1, 1, 2):
            nb = (b + d) & ((1 << 64) - 1)
            if _finite(nb):
                bits.append(nb)
    for _ in range(5000):
        bits.append(_bits(rng.random() * 10 ** rng.randint(-320, 30)))
    for _ in range(3000):
        bits.append(rng.getrandbits(52))  # subnormals

    java = probe(bits)
    bad = []
    for b, want in zip(bits, java):
        d = struct.unpack(">d", struct.pack(">Q", b))[0]
        got = java17_double_repr(d)
        if got != want:
            bad.append((f"{b:016x}", want, got))
    assert not bad, f"{len(bad)} mismatches vs JVM; first 10: {bad[:10]}"
