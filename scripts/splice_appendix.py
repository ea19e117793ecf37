#!/usr/bin/env python3
"""Splice the RegistryReport-generated 2.3 appendix into SURVEY.md.

Replaces everything from the '### 2.3 Registry appendix' heading to the
next '## ' (or '### ') heading — or EOF — with the generated file, so
the appendix can never drift from Registry.all by hand-editing.

Usage: splice_appendix.py <registry_appendix.md> [SURVEY.md]
"""
import re
import sys

appendix_path = sys.argv[1]
survey_path = sys.argv[2] if len(sys.argv) > 2 else "SURVEY.md"

appendix = open(appendix_path).read().rstrip() + "\n"
survey = open(survey_path).read()

m = re.search(r"^### 2\.3 Registry appendix[^\n]*\n", survey, re.M)
if not m:
    sys.exit("no 2.3 appendix heading found in " + survey_path)
tail = survey[m.end():]
nxt = re.search(r"^#{2,3} ", tail, re.M)
end = m.end() + (nxt.start() if nxt else len(tail))

open(survey_path, "w").write(survey[: m.start()] + appendix + survey[end:])
print(f"[splice] replaced {end - m.start()} bytes of appendix in {survey_path}")
