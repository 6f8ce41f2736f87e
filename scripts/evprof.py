#!/usr/bin/env python3
"""Parse the newest /tmp/sparkev rolling event log and print per-jobGroup
stage timings (WARM:<query> groups emitted by the Scratch profiler).
Dev tool for optimization rounds — reads Spark's public event-log JSON.
"""
import json, glob, os, subprocess, sys, collections

d = sorted(glob.glob('/tmp/sparkev/eventlog_v2_*'))[-1]
lines = []
for fp in sorted(glob.glob(d + '/events_*')):
    if fp.endswith('.zstd'):
        out = subprocess.run(['zstd', '-dc', fp], capture_output=True).stdout
        lines += out.decode(errors='ignore').splitlines()
    else:
        lines += open(fp, errors='ignore').read().splitlines()

groups = collections.defaultdict(list)   # group -> [(jobid, [stageids])]
stages = {}
for line in lines:
    try:
        e = json.loads(line)
    except Exception:
        continue
    t = e.get('Event')
    if t == 'SparkListenerJobStart':
        g = e.get('Properties', {}).get('spark.jobGroup.id', '')
        if g.startswith('WARM:'):
            groups[g[5:]].append((e['Job ID'], [s['Stage ID'] for s in e['Stage Infos']]))
    elif t == 'SparkListenerStageCompleted':
        si = e['Stage Info']
        sub, comp = si.get('Submission Time'), si.get('Completion Time')
        stages[si['Stage ID']] = ((comp - sub) / 1000 if sub and comp else None,
                                  si['Number of Tasks'])

only = set(sys.argv[1:])
for q, jobs in groups.items():
    if only and q not in only:
        continue
    tot = 0.0
    print(f"== {q}: {len(jobs)} jobs")
    for jid, sids in jobs:
        parts = []
        for sid in sorted(set(sids)):
            if sid in stages and stages[sid][0] is not None:
                dur, nt = stages[sid]
                tot += dur
                parts.append(f"s{sid}:{dur:.2f}s/{nt}t")
        print(f"   job {jid}: " + " ".join(parts))
    print(f"   stage-time total {tot:.2f}s")
