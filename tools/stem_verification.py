#!/usr/bin/env python
"""On-demand regression sweep: run models and verify stem labels match content.

TPU-native counterpart of the reference's regression tier
(ref: tests/regression/test_all_models_stem_verification.py): for every
supported model (or a filtered subset), separate a 20 s fixture and classify
each output stem's content by correlation against known-good reference stems
(audio_separator_tpu.utils.audio_verification.verify_stem_label). A stem
labelled "(Vocals)" must contain vocal content, nothing may emit silence or
leak the untouched mix, and sub-/utility-/partial-stem categories get the
relaxed treatment their semantics require.

Not part of CI — it downloads real checkpoints. Run it after changing stem
naming, registry data, or separator assignment logic:

    python tools/stem_verification.py                          # all models
    python tools/stem_verification.py --arch VR --arch MDX     # two families
    python tools/stem_verification.py --filter roformer        # name substring
    python tools/stem_verification.py --report-only --json report.json

Exit code 0 iff every verified model passed (always 0 with --report-only).
"""

import argparse
import json
import logging
import os
import re
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STEM_LABEL_RE = re.compile(r"_\(([^)]+)\)")


def iter_models(filters, archs):
    from audio_separator_tpu.separator import Separator

    sep = Separator(info_only=True, log_level=logging.WARNING)
    for arch, models in sep.list_supported_model_files().items():
        if archs and arch.lower() not in archs:
            continue
        for friendly_name, info in models.items():
            filename = info.get("filename") if isinstance(info, dict) else info
            if not filename:
                continue
            if filters and not any(
                    f in filename.lower() or f in friendly_name.lower()
                    for f in filters):
                continue
            yield arch, friendly_name, filename


def verify_model(arch, friendly_name, filename, input_file, refs):
    """Run one model end-to-end; returns a result dict."""
    from audio_separator_tpu.separator import Separator
    from audio_separator_tpu.utils.audio_verification import (
        is_specialized_model, verify_stem_label)

    ref_vocal, ref_inst, ref_mix, min_len = refs
    relaxed = is_specialized_model(filename, friendly_name)
    out_dir = tempfile.mkdtemp(prefix="stemverify_")
    result = {"model": filename, "arch": arch, "friendly_name": friendly_name,
              "specialized": relaxed, "stems": [], "status": "PASS"}
    try:
        try:
            sep = Separator(output_dir=out_dir, output_format="WAV",
                            log_level=logging.WARNING)
            sep.load_model(filename)
            output_files = sep.separate(input_file)
        except Exception as exc:  # noqa: BLE001 — download/run failure is SKIP, not FAIL
            result["status"] = "SKIP"
            result["error"] = f"{type(exc).__name__}: {exc}"
            return result

        if not output_files:
            result["status"] = "FAIL"
            result["error"] = "separation produced no output files"
            return result
        for out in output_files:
            path = out if os.path.isabs(out) else os.path.join(out_dir, out)
            if not os.path.exists(path):
                path = os.path.join(out_dir, os.path.basename(out))
            match = STEM_LABEL_RE.search(os.path.basename(path))
            label = match.group(1) if match else "Unknown"
            # One unreadable/missing stem must not abort a multi-hour sweep:
            # it's this model's FAIL, the loop carries on.
            try:
                passed, msg = verify_stem_label(path, label, ref_vocal,
                                                ref_inst, ref_mix, min_len)
            except Exception as exc:  # noqa: BLE001
                passed, msg = False, f"unreadable output {path}: {exc}"
            if not passed and relaxed:
                passed, msg = True, f"WARN (specialized model): {msg}"
            result["stems"].append({"label": label, "passed": passed, "msg": msg})
            if not passed:
                result["status"] = "FAIL"
        return result
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("input", nargs="?",
                        default=os.environ.get(
                            "AUDSEP_FIXTURES_DIR",
                            "/root/reference/tests/inputs") + "/mardy20s.flac")
    parser.add_argument("--filter", action="append", default=[],
                        help="substring filter on model/friendly name (repeatable)")
    parser.add_argument("--arch", action="append", default=[],
                        help="restrict to an architecture (VR/MDX/MDXC/Demucs)")
    parser.add_argument("--limit", type=int, default=0,
                        help="stop after N models (0 = all)")
    parser.add_argument("--report-only", action="store_true",
                        help="never exit nonzero (like STEM_VERIFY_REPORT_ONLY=1)")
    parser.add_argument("--json", dest="json_path",
                        help="write the full report as JSON here")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.WARNING)

    from audio_separator_tpu.utils.audio_verification import load_references

    refs = load_references(input_dir=os.path.dirname(args.input))

    filters = [f.lower() for f in args.filter]
    archs = [a.lower() for a in args.arch]
    results = []
    counts = {"PASS": 0, "FAIL": 0, "SKIP": 0}
    for arch, friendly_name, filename in iter_models(filters, archs):
        if args.limit and len(results) >= args.limit:
            break
        print(f"\n{filename} ({arch})\n  {friendly_name}", flush=True)
        res = verify_model(arch, friendly_name, filename, args.input, refs)
        results.append(res)
        counts[res["status"]] += 1
        if res.get("error"):
            print(f"  {res['status']}  {res['error']}", flush=True)
        for stem in res["stems"]:
            tag = "PASS" if stem["passed"] else "FAIL"
            print(f"  {stem['label']:<20} {tag}  {stem['msg']}", flush=True)

    print(f"\n=== {counts['PASS']} passed, {counts['FAIL']} failed, "
          f"{counts['SKIP']} skipped of {len(results)} models ===", flush=True)
    if args.json_path:
        with open(args.json_path, "w") as fh:
            json.dump({"input": args.input, "counts": counts,
                       "results": results}, fh, indent=2)
    return 0 if (args.report_only or counts["FAIL"] == 0) else 1


if __name__ == "__main__":
    sys.exit(main())
