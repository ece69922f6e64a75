"""Console entry point for the model export tool (scripts/export_model.py
logic, packaged)."""


def main() -> None:
    import runpy
    import sys
    from pathlib import Path

    script = Path(__file__).resolve().parents[1] / "scripts" / "export_model.py"
    if script.exists():
        sys.argv[0] = str(script)
        runpy.run_path(str(script), run_name="__main__")
    else:  # installed wheel: inline the tool
        raise SystemExit(
            "export tool requires the repository checkout (scripts/export_model.py)"
        )
