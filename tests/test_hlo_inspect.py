"""hlo_inspect parsing: CPU-style and TPU-tiled-layout HLO lines."""

from mop_tpu.utils import collective_summary


def test_parses_cpu_and_tpu_layouts():
    hlo = """
  %ar.1 = f32[512,256]{1,0} all-reduce(f32[512,256]{1,0} %p0), replica_groups={}
  %ar.2 = f32[512,512]{1,0:T(8,128)} all-reduce-start(f32[512,512] %x)
  %t = (f32[4]{0:T(8)}, bf16[2,2]{1,0:T(8,128)(2,1)}) all-to-all(...)
  %cp = u8[16]{0} collective-permute(u8[16]{0} %y)
  %done = f32[512,512]{1,0:T(8,128)} all-reduce-done(%ar.2)
"""
    s = collective_summary(hlo)
    assert s["all-reduce"]["count"] == 2  # -done not double-counted
    assert s["all-reduce"]["bytes"] == 512 * 256 * 4 + 512 * 512 * 4
    assert s["all-to-all"]["count"] == 1
    assert s["all-to-all"]["bytes"] == 4 * 4 + 2 * 2 * 2
    assert s["collective-permute"]["bytes"] == 16
