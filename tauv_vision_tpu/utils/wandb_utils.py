"""Weights & Biases asset janitor.

Parity target: ``utils/wandb_utils.py`` — bulk-delete run files via the
wandb API.  The entity/project are arguments here instead of the
reference's hardcoded ``tartanauv`` entity; wandb itself is an optional
dependency (not present in this image) so the import is deferred.
"""

from __future__ import annotations

import argparse


def delete_run_files(
    entity: str, project: str, keep_latest: int = 0, dry_run: bool = True
) -> int:
    """Delete all file assets of every run in a project (optionally keep
    the newest ``keep_latest`` runs untouched).  Returns files deleted."""
    import wandb  # deferred: optional dependency

    api = wandb.Api()
    runs = sorted(
        api.runs(f"{entity}/{project}"),
        key=lambda r: r.created_at or "",
        reverse=True,
    )
    deleted = 0
    for run in runs[keep_latest:]:
        for file in run.files():
            if dry_run:
                print(f"would delete {run.id}/{file.name}")
            else:
                file.delete()
            deleted += 1
    return deleted


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("entity")
    parser.add_argument("project")
    parser.add_argument("--keep-latest", type=int, default=0)
    parser.add_argument("--delete", action="store_true",
                        help="actually delete (default: dry run)")
    args = parser.parse_args()
    n = delete_run_files(
        args.entity, args.project, args.keep_latest, dry_run=not args.delete
    )
    print(f"{'would delete' if not args.delete else 'deleted'} {n} files")


if __name__ == "__main__":
    main()
