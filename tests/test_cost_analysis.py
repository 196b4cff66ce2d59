"""tools/cost_analysis.py: the roofline diagnostic runs and reports sane
cost-model numbers for a shipped frame program."""

import importlib.util
import pathlib
import re


def _load_tool():
    path = pathlib.Path(__file__).resolve().parents[1] / "tools" / "cost_analysis.py"
    spec = importlib.util.spec_from_file_location("cost_analysis_tool", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_analyze_reports_roofline(capsys):
    tool = _load_tool()
    tool.analyze("MiDaS_small", "float32", (64, 96), peak_tflops=197.0, hbm_gbs=819.0)
    out = capsys.readouterr().out
    assert "MiDaS_small" in out and "memory" in out
    # flops and bytes are positive and the floor is the larger bound
    m = re.search(r"flops\s+([\d.]+) G\s+bytes\s+([\d.]+) GB.*compute\s+([\d.]+) ms \(\d+-pass\)\s+memory\s+([\d.]+) ms.*floor ([\d.]+) ms", out)
    assert m, out
    flops, bytes_gb, t_c, t_m, floor = map(float, m.groups())
    assert flops > 0 and bytes_gb > 0
    assert abs(floor - max(t_c, t_m)) < 0.01
