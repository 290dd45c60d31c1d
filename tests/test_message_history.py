"""Unit oracle for message_history: the reference's
build_message_history (llm_integration/engine.py:124-166) ported
verbatim as a pure-Python recompute over the taskflow fixture, run on
the real sf0.001 events table independent of both Spark and DuckDB."""

import json

SF_DIR = "/root/testdata/sf0.001"


def _fixture_tasks(spark):
    rows = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id", "props")
        .where("event_id < 120")
        .collect()
    )
    tasks = {}
    for r in rows:
        k = int(json.loads(r["props"])["k"])
        seq = r["event_id"]
        deps = []
        if k % 5 == 0 and seq >= 2:
            deps.append(f"T{seq - 2}")
        if k % 7 == 0 and seq >= 3:
            deps.append(f"T{seq - 3}")
        tasks[f"T{seq}"] = {"seq": seq, "deps": deps}
    return tasks


def _completed(seq):
    """(status, result) per the fixture: None status = never completed."""
    if seq % 11 == 5:
        return None, None
    status = "failed" if seq % 4 == 3 else "success"
    if seq % 10 == 7:
        result = None
    elif seq % 2 == 0:
        result = f"R{seq}"
    else:
        result = json.dumps({"answer": seq})
    return status, result


def _reference_build(task_id, tasks):
    """Verbatim port of build_message_history's control flow: sorted()
    over dep-id STRINGS, skip unless completed+success+non-null."""
    messages, corpus_parts = [], []
    for dep_id in sorted(tasks[task_id]["deps"]):
        status, result = _completed(tasks[dep_id]["seq"])
        if status == "success" and result is not None:
            messages.append(("user", f"ask {dep_id}"))
            messages.append(("assistant", result))
            corpus_parts.append(result)
    messages.append(("user", f"ask {task_id}"))
    corpus = "\n\n---\n\n".join(corpus_parts) if corpus_parts else None
    return messages, corpus


def test_message_history_recompute(spark):
    from pdf_extractor_spark.analytics.taskflow import message_history

    tasks = _fixture_tasks(spark)
    out = {r["task_id"]: r for r in message_history(spark, SF_DIR).collect()}
    assert set(out) == set(tasks)

    saw_ctx = saw_skip = False
    for task_id in tasks:
        want_msgs, want_corpus = _reference_build(task_id, tasks)
        row = out[task_id]
        got = [tuple(m.split(": ", 1)) for m in row["messages"]]
        assert got == want_msgs, task_id
        assert row["n_messages"] == len(want_msgs), task_id
        assert row["corpus"] == want_corpus, task_id
        saw_ctx = saw_ctx or len(want_msgs) > 1
        # a task whose deps exist but ALL got skipped exercises the
        # warning branches
        if tasks[task_id]["deps"] and len(want_msgs) == 1:
            saw_skip = True
    assert saw_ctx and saw_skip


def test_message_history_json_branch(spark):
    """Odd-seq dep results travel through the dict branch: the
    assistant message must be the json.dumps form."""
    from pdf_extractor_spark.analytics.taskflow import message_history

    tasks = _fixture_tasks(spark)
    out = {r["task_id"]: r for r in message_history(spark, SF_DIR).collect()}
    hits = 0
    for task_id, t in tasks.items():
        for dep_id in t["deps"]:
            seq = tasks[dep_id]["seq"]
            status, result = _completed(seq)
            if status == "success" and result is not None and seq % 2 == 1:
                assert f"assistant: {{\"answer\": {seq}}}" in out[task_id][
                    "messages"
                ], task_id
                hits += 1
    assert hits > 0


def test_lesson_add_validate_recompute(spark):
    """Verbatim port of add_lesson's validation + embedding-text
    assembly (lessons_crud.py:46-113) over the derived fixture."""
    import hashlib

    from pdf_extractor_spark.analytics.search_api import lesson_add_validate

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }

    def reference_add(doc_id, text):
        data = {}
        data["problem"] = "" if doc_id % 7 == 0 else "P: " + text[:30]
        if doc_id % 11 != 3:
            data["solution"] = "S: " + text[30:60]
        if doc_id % 5 == 2:
            data["context"] = None
        if doc_id % 3 == 1:
            data["example"] = "" if doc_id % 9 == 4 else f"E: {doc_id}"
        for field in ["problem", "solution"]:
            if field not in data or not data[field]:
                return (
                    False,
                    f"Required field '{field}' is missing or empty in lesson data",
                    None,
                )
        embed = " ".join(
            str(data.get(f, ""))
            for f in ["problem", "solution", "context", "example"]
            if f in data
        )
        return True, None, embed

    out = {r["doc_id"]: r for r in lesson_add_validate(spark, SF_DIR).collect()}
    assert set(out) == set(docs)
    classes = set()
    for doc_id, text in docs.items():
        valid, err, embed = reference_add(doc_id, text)
        row = out[doc_id]
        assert row["valid"] == valid, doc_id
        assert row["error"] == err, doc_id
        assert row["embed_text"] == embed, doc_id
        key = "lesson_" + hashlib.md5(str(doc_id).encode()).hexdigest()[:8]
        assert row["lesson_key"] == key, doc_id
        if not valid:
            classes.add(err.split("'")[1])
        elif embed and "None" in embed:
            classes.add("none-quirk")
        if valid and embed and "  " in embed:
            classes.add("double-space")
    # all four behaviors must be exercised by the corpus
    assert classes == {"problem", "solution", "none-quirk", "double-space"}
