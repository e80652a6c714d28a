/* ISCC-Search TPU web frontend: search + lookup + aggregator dashboard. */

const $ = (sel) => document.querySelector(sel);

async function api(path, opts = {}) {
  const res = await fetch(path, Object.assign({ headers: { "Content-Type": "application/json" } }, opts));
  const body = await res.json().catch(() => null);
  if (!res.ok) {
    const detail = body && body.detail ? JSON.stringify(body.detail) : res.statusText;
    throw new Error(`HTTP ${res.status}: ${detail}`);
  }
  return body;
}

function fmtScore(s) {
  return (Math.round(s * 1000) / 1000).toFixed(3);
}

function renderMatches(result) {
  const out = $("#results");
  const globals = result.global_matches || [];
  const chunks = result.chunk_matches || [];
  if (!globals.length && !chunks.length) {
    out.innerHTML = '<p class="muted">No matches.</p>';
    return;
  }
  let html = "";
  if (globals.length) {
    html += "<h3>Global matches</h3><table><tr><th>ISCC-ID</th><th>Score</th><th>Unit types</th></tr>";
    for (const m of globals) {
      const types = Object.entries(m.types || {})
        .map(([t, s]) => `<span class="pill">${t}: ${fmtScore(s)}</span>`)
        .join(" ");
      html += `<tr><td class="mono">${m.iscc_id}</td><td class="score">${fmtScore(m.score)}</td><td>${types}</td></tr>`;
    }
    html += "</table>";
  }
  if (chunks.length) {
    html += "<h3>Chunk matches</h3><table><tr><th>ISCC-ID</th><th>Score</th><th>Types</th></tr>";
    for (const m of chunks) {
      const types = Object.entries(m.types || {})
        .map(([t, r]) => `<span class="pill">${t}: ${r.matches}/${r.queried} @ ${fmtScore(r.score)}</span>`)
        .join(" ");
      html += `<tr><td class="mono">${m.iscc_id}</td><td class="score">${fmtScore(m.score)}</td><td>${types}</td></tr>`;
    }
    html += "</table>";
  }
  out.innerHTML = html;
}

async function doSearch() {
  const out = $("#results");
  const indexName = $("#index").value.trim() || "default";
  const value = $("#query").value.trim();
  if (!value) return;
  out.innerHTML = '<p class="muted">Searching…</p>';
  try {
    let query;
    if (/^ISCC:[A-Z2-7]{16}$/.test(value)) {
      query = { iscc_id: value };
    } else if (/^ISCC:[A-Z2-7]{16,}$/.test(value)) {
      query = { iscc_code: value };
    } else {
      throw new Error("Enter a canonical ISCC-CODE or ISCC-ID (ISCC:…)");
    }
    const result = await api(`/indexes/${indexName}/search?limit=20`, {
      method: "POST",
      body: JSON.stringify(query),
    });
    renderMatches(result);
  } catch (e) {
    out.innerHTML = `<p class="err">${e.message}</p>`;
  }
}

async function loadIndexes() {
  try {
    const indexes = await api("/indexes");
    const sel = $("#index");
    sel.innerHTML = "";
    for (const idx of indexes) {
      const opt = document.createElement("option");
      opt.value = idx.name;
      opt.textContent = `${idx.name} (${idx.assets ?? 0} assets)`;
      sel.appendChild(opt);
    }
    if (!indexes.length) sel.innerHTML = '<option value="default">default</option>';
  } catch (e) {
    /* index listing is optional on public deployments */
  }
}

async function refreshStatus() {
  const el = $("#status");
  if (!el) return;
  try {
    const st = await api("/status");
    let html = `<span class="pill">v${st.version}</span><span class="pill">${st.mode}</span>`;
    if (st.network) html += `<span class="pill">${st.network}</span>`;
    if (st.index) html += `<span class="pill">${st.index.assets ?? 0} assets / ${st.index.size ?? 0} MB</span>`;
    el.innerHTML = html;
    const hubsEl = $("#hubs");
    if (hubsEl && st.hubs) {
      let rows =
        "<table><tr><th>Hub</th><th>URL</th><th>Cursor</th><th>Status</th><th>Indexed</th><th>Skipped</th></tr>";
      for (const h of st.hubs) {
        const counts = h.counts || {};
        const skipped = Object.entries(counts)
          .filter(([k]) => k !== "ok")
          .map(([k, v]) => (v ? `${k}: ${v}` : null))
          .filter(Boolean)
          .join(", ");
        rows += `<tr><td>${h.hub_id}</td><td class="mono">${h.url}</td><td>${h.cursor}</td>` +
          `<td class="${h.ok ? "ok" : "err"}">${h.ok ? "ok" : h.error || "error"}</td>` +
          `<td>${counts.ok || 0}</td><td class="muted">${skipped || "—"}</td></tr>`;
      }
      hubsEl.innerHTML = rows + "</table>";
    }
  } catch (e) {
    el.innerHTML = `<span class="err">${e.message}</span>`;
  }
}

window.addEventListener("DOMContentLoaded", () => {
  if ($("#searchBtn")) {
    $("#searchBtn").addEventListener("click", doSearch);
    $("#query").addEventListener("keydown", (e) => e.key === "Enter" && doSearch());
    loadIndexes();
  }
  refreshStatus();
  if ($("#hubs")) setInterval(refreshStatus, 10000);
});
