"""CLI entry points (pyproject ``[project.scripts]``): detjax-train,
detjax-eval, detjax-detect, detjax-bench — the package mirrors of the
reference's root-level ``train.py`` / ``coco_eval.py`` / ``visualize.py``
scripts (SURVEY.md §1 CLI layer). ``scripts/`` holds path-independent
wrappers for running from a checkout without installing."""
