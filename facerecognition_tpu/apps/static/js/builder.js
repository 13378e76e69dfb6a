// Database-builder page: launch a background build, poll
// /database-builder/status/<job_id> into a progress bar + log tail
// (reference templates/database_builder.html:844-882 interaction set).
(() => {
  const esc = (s) => String(s).replace(/[&<>"]/g,
    (c) => ({'&': '&amp;', '<': '&lt;', '>': '&gt;', '"': '&quot;'}[c]));

  document.getElementById('builderform').addEventListener('submit', async (e) => {
    e.preventDefault();
    const fd = new FormData(e.target);
    const r = await fetch('/database-builder/build', {
      method: 'POST',
      body: new URLSearchParams(fd),
    });
    const j = await r.json();
    if (j.error) { alert(j.error); return; }
    document.getElementById('jobcard').style.display = 'block';
    const poll = setInterval(async () => {
      const s = await (await
        fetch('/database-builder/status/' + j.job_id)).json();
      document.getElementById('jtitle').textContent =
        `${s.model_type} build — ${s.status}`;
      document.getElementById('bar').style.width = (s.progress ?? 0) + '%';
      document.getElementById('jmeta').textContent =
        `${(s.elapsed_seconds ?? 0).toFixed(1)} s elapsed`;
      document.getElementById('logs').textContent = (s.logs || []).join('\n');
      document.getElementById('files').innerHTML = (s.output_files || []).map(
        (p) => `<a href="/database-builder/download/${esc(p)}" download>` +
               `${esc(p)}</a>`).join(' ');
      if (s.status === 'completed' || s.status === 'failed') clearInterval(poll);
    }, 700);
  });
})();
