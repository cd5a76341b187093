#!/usr/bin/env python3
"""Extract one query's formatted-plan section from a PLANS.md into
plans/<round>/<query>_<tag>.txt — used by the optimization rounds to
snapshot before/after plans without re-running Spark per query.

Usage: extract_plan.py <plans_md> <out_dir> <tag> <query> [<query> ...]
"""
import sys, os, re

def main():
    plans_md, out_dir, tag = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    text = open(plans_md, encoding="utf-8").read()
    os.makedirs(out_dir, exist_ok=True)
    # sections start at "## <name>" and run to the next "## " or EOF
    starts = [(m.start(), m.group(1)) for m in
              re.finditer(r"^## (.+)$", text, re.M)]
    starts.append((len(text), None))
    sections = {}
    for (pos, name), (nxt, _) in zip(starts, starts[1:]):
        if name:
            sections.setdefault(name.strip(), text[pos:nxt].rstrip() + "\n")
    for q in names:
        hits = [k for k in sections if k == q or k.startswith(q + " ")]
        if not hits:
            print(f"[extract_plan] MISSING section for {q}", file=sys.stderr)
            continue
        out = os.path.join(out_dir, f"{q}_{tag}.txt")
        with open(out, "w", encoding="utf-8") as f:
            for k in hits:
                f.write(sections[k])
                f.write("\n")
        print(f"wrote {out} ({sum(len(sections[k]) for k in hits)} bytes)")

if __name__ == "__main__":
    main()
