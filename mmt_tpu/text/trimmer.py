"""Round-robin budget trimming across multiple text fields.

Re-provides ``tensorflow_text.RoundRobinTrimmer`` capability (call site
``src/data/data_utils.py:121, 259``): given several word-aligned token
lists and a total wordpiece budget, allocate the budget one *item*
(word) at a time round-robin across fields, so each field keeps its
leading words and short fields cede budget to long ones.
"""

from __future__ import annotations

from typing import List, Sequence


def round_robin_trim(
    fields: Sequence[List[List[int]]], max_total_wordpieces: int
) -> List[List[List[int]]]:
    """Trims fields (word-aligned) to a shared wordpiece budget.

    Budget accounting is per *wordpiece* while allocation granularity is
    per *word*: a word is kept only if all its wordpieces fit in the
    remaining budget; once a field's next word does not fit (or the field
    is exhausted) that field stops receiving budget.

    Returns new word-aligned lists (leading words of each field).
    """
    keep_counts = [0] * len(fields)
    remaining = max_total_wordpieces
    active = [True] * len(fields)
    while any(active) and remaining > 0:
        progressed = False
        for i, field in enumerate(fields):
            if not active[i]:
                continue
            j = keep_counts[i]
            if j >= len(field):
                active[i] = False
                continue
            cost = len(field[j])
            if cost <= remaining:
                keep_counts[i] += 1
                remaining -= cost
                progressed = True
            else:
                active[i] = False
        if not progressed:
            break
    return [field[: keep_counts[i]] for i, field in enumerate(fields)]
