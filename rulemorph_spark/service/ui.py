"""Browser UI: a single-file SPA over the ``/ui/api/*`` endpoints.

Vanilla-JS/SVG port of the reference React app's two views
(``rulemorph_ui/ui/src/App.tsx``, ``view_mode.ts``):

- **overview** — the static API dependency graph (endpoints → rules →
  network/branch refs) drawn as a layered DAG, with a node detail
  panel (buildMergedApiGraph / ApiDetail, App.tsx:902/:236);
- **trace** — a live trace list (TraceListItem rows, watcher-driven
  via the long-poll ``/ui/api/trace-version``) and, on selection, the
  per-request execution graph with durations on edges, error nodes
  highlighted, and an input/output JSON panel per selected step
  (buildOverviewGraph / DetailNode, App.tsx:305/:77).

Graph building + layout live server-side in ``service/trace.py``
(unit-testable); this page only positions and draws what the API
returns, so it needs no build step and no bundled framework.
"""

from __future__ import annotations

_CSS = """
:root{--bg:#fff;--fg:#1a1a2e;--line:#d0d4dc;--accent:#3b5bdb;
  --err:#c92a2a;--muted:#868e96}
body{font-family:system-ui,sans-serif;margin:0;color:var(--fg)}
header{display:flex;align-items:center;gap:1rem;padding:.6rem 1.2rem;
  border-bottom:1px solid var(--line)}
header h1{font-size:1.05rem;margin:0}
nav button{border:1px solid var(--line);background:#f5f6f8;
  padding:.35rem .9rem;cursor:pointer;border-radius:4px}
nav button.active{background:var(--accent);color:#fff;
  border-color:var(--accent)}
main{display:flex;min-height:calc(100vh - 3rem)}
#sidebar{width:21rem;border-right:1px solid var(--line);padding:.8rem;
  overflow:auto}
#canvas{flex:1;overflow:auto;padding:.8rem}
#detail{width:24rem;border-left:1px solid var(--line);padding:.8rem;
  overflow:auto}
table{border-collapse:collapse;font-size:.82rem;width:100%}
td,th{border:1px solid var(--line);padding:.25rem .5rem;
  text-align:left}
tr.sel td{background:#e7ecff}
tr.row{cursor:pointer}
tr.err td{color:var(--err)}
svg .node rect{fill:#f1f3f5;stroke:#adb5bd;rx:6}
svg .node.endpoint rect{fill:#e7f5ff;stroke:#339af0}
svg .node.network rect{fill:#fff4e6;stroke:#f08c00}
svg .node.request rect,svg .node.response rect{fill:#e6fcf5;
  stroke:#0ca678}
svg .node.err rect{fill:#fff0f0;stroke:var(--err);stroke-width:2}
svg .node.sel rect{stroke:var(--accent);stroke-width:2.5}
svg .node text{font-size:11px}
svg .edge{stroke:#adb5bd;fill:none;marker-end:url(#arr)}
svg .edge.err{stroke:var(--err)}
svg .elabel{font-size:9.5px;fill:var(--muted)}
pre{background:#f8f9fa;border:1px solid var(--line);padding:.5rem;
  font-size:.75rem;white-space:pre-wrap;word-break:break-all}
h3{margin:.4rem 0 .3rem;font-size:.9rem}
.muted{color:var(--muted)}
"""

# NOTE for maintainers: test_trace_graph.py pins the literals
# "trace-version" and "renderGraph" in the served page.
_JS = """
async function j(u){const r=await fetch(u);return r.json();}
function esc(s){const d=document.createElement('span');
  d.textContent=String(s);return d.innerHTML;}

const S={view:'overview',traces:[],traceId:null,trace:null,
         selNode:null,apiGraph:null,traceGraph:null};

function setView(v){S.view=v;S.selNode=null;render();}

function nodePos(n){return {x:40+n.layer*230,y:46+n.row*74};}

function drawGraph(g,onSel){
  if(!g||!g.nodes||!g.nodes.length){
    document.getElementById('canvas').innerHTML=
      '<p class="muted">empty graph</p>';
    return;
  }
  const W=Math.max(...g.nodes.map(n=>nodePos(n).x))+240;
  const H=Math.max(...g.nodes.map(n=>nodePos(n).y))+90;
  const pos={};g.nodes.forEach(n=>pos[n.id]=nodePos(n));
  let out='<svg width="'+W+'" height="'+H+'">'
    +'<defs><marker id="arr" viewBox="0 0 10 10" refX="9" refY="5" '
    +'markerWidth="7" markerHeight="7" orient="auto-start-reverse">'
    +'<path d="M 0 0 L 10 5 L 0 10 z" fill="#adb5bd"/></marker></defs>';
  for(const e of g.edges){
    const a=pos[e.from],b=pos[e.to];if(!a||!b)continue;
    const x1=a.x+180,y1=a.y+22,x2=b.x,y2=b.y+22,
          mx=(x1+x2)/2;
    out+='<path class="edge'+(e.error?' err':'')+'" d="M'+x1+' '+y1
      +' C '+mx+' '+y1+' '+mx+' '+y2+' '+x2+' '+y2+'"/>';
    const lbl=e.label||e.kind||'';
    if(lbl)out+='<text class="elabel" x="'+(mx-14)+'" y="'
      +((y1+y2)/2-5)+'">'+esc(lbl)+'</text>';
  }
  for(const n of g.nodes){
    const p=pos[n.id];
    const cls='node '+(n.kind||'')+(n.error?' err':'')
      +(S.selNode===n.id?' sel':'');
    out+='<g class="'+cls+'" data-id="'+esc(n.id)+'">'
      +'<rect x="'+p.x+'" y="'+p.y+'" width="180" height="44"/>'
      +'<text x="'+(p.x+9)+'" y="'+(p.y+18)+'">'
      +esc((n.label||n.id).slice(0,28))+'</text>'
      +'<text class="muted" x="'+(p.x+9)+'" y="'+(p.y+34)
      +'" fill="#868e96">'+esc(n.kind||'')+'</text></g>';
  }
  out+='</svg>';
  const el=document.getElementById('canvas');
  el.innerHTML=out;
  el.querySelectorAll('.node').forEach(nd=>
    nd.addEventListener('click',()=>onSel(nd.dataset.id)));
}

function renderGraph(){ /* overview view: static API graph */
  drawGraph(S.apiGraph,(id)=>{S.selNode=id;render();});
}

function renderOverviewDetail(){
  const d=document.getElementById('detail');
  if(!S.selNode){d.innerHTML='<p class="muted">select a node</p>';return;}
  const n=S.apiGraph.nodes.find(n=>n.id===S.selNode)||{};
  const ins=S.apiGraph.edges.filter(e=>e.to===S.selNode);
  const outs=S.apiGraph.edges.filter(e=>e.from===S.selNode);
  d.innerHTML='<h3>'+esc(n.id)+'</h3>'
    +'<p>kind: <code>'+esc(n.kind)+'</code></p>'
    +'<h3>referenced by</h3>'+(ins.length?'<ul>'+ins.map(e=>
      '<li><code>'+esc(e.from)+'</code> <em>('+esc(e.kind)+')</em></li>')
      .join('')+'</ul>':'<p class="muted">—</p>')
    +'<h3>references</h3>'+(outs.length?'<ul>'+outs.map(e=>
      '<li><code>'+esc(e.to)+'</code> <em>('+esc(e.kind)+')</em></li>')
      .join('')+'</ul>':'<p class="muted">—</p>');
}

function renderTraceList(){
  const rows=S.traces.slice(-100).reverse().map(t=>
    '<tr class="row'+(t.trace_id===S.traceId?' sel':'')
    +(t.error?' err':'')+'" data-id="'+esc(t.trace_id)+'">'
    +'<td>'+esc(t.method)+'</td><td><code>'+esc(t.path)+'</code></td>'
    +'<td>'+esc(t.status)+'</td><td>'+esc(t.total_ms)+' ms</td></tr>');
  const sb=document.getElementById('sidebar');
  sb.innerHTML='<h3>traces</h3><table id="traces">'
    +'<tr><th>method</th><th>path</th><th>status</th><th>time</th></tr>'
    +rows.join('')+'</table>';
  sb.querySelectorAll('tr.row').forEach(tr=>
    tr.addEventListener('click',()=>selectTrace(tr.dataset.id)));
}

async function selectTrace(id){
  S.traceId=id;S.selNode=null;
  S.trace=await j('/ui/api/trace?id='+encodeURIComponent(id));
  S.traceGraph=await j('/ui/api/trace-graph?id='+encodeURIComponent(id));
  render();
}

function renderTraceDetail(){
  const d=document.getElementById('detail');
  if(!S.trace){d.innerHTML='<p class="muted">select a trace</p>';return;}
  if(!S.selNode){
    d.innerHTML='<h3>'+esc(S.trace.method)+' '+esc(S.trace.path)+'</h3>'
      +'<p>status '+esc(S.trace.status)+' · '+esc(S.trace.total_ms)
      +' ms · '+S.trace.steps.length+' step(s)</p>'
      +'<p class="muted">select a step node</p>';
    return;
  }
  const m=S.selNode.match(/^s(\\d+):/);
  if(!m){d.innerHTML='<h3>'+esc(S.selNode)+'</h3>';return;}
  const s=S.trace.steps[Number(m[1])];
  d.innerHTML='<h3>'+esc(s.name)+'</h3>'
    +'<p>kind <code>'+esc(s.kind)+'</code> · '+esc(s.elapsed_ms)+' ms</p>'
    +(s.error?'<h3>error</h3><pre>'+esc(s.error)+'</pre>':'')
    +'<h3>input</h3><pre>'+esc(JSON.stringify(s.input,null,1))+'</pre>'
    +'<h3>output</h3><pre>'+esc(JSON.stringify(s.output,null,1))+'</pre>';
}

function render(){
  document.querySelectorAll('nav button').forEach(b=>
    b.classList.toggle('active',b.dataset.view===S.view));
  if(S.view==='overview'){
    document.getElementById('sidebar').innerHTML=
      document.getElementById('endpoints-tpl').innerHTML;
    if(S.apiGraph)renderGraph();
    renderOverviewDetail();
  }else{
    renderTraceList();
    if(S.traceGraph){
      drawGraph(S.traceGraph,(id)=>{S.selNode=id;render();});
    }else{
      document.getElementById('canvas').innerHTML=
        '<p class="muted">select a trace</p>';
    }
    renderTraceDetail();
  }
}

async function refreshTraces(){
  S.traces=(await j('/ui/api/traces?summary=1')).traces;
  if(S.view==='trace')render();
}

async function watch(){ /* long-poll /ui/api/trace-version */
  let v=(await j('/ui/api/trace-version')).version;
  for(;;){
    try{
      const nv=(await j('/ui/api/trace-version?since='+v)).version;
      if(nv>v){v=nv;await refreshTraces();}
    }catch(e){await new Promise(r=>setTimeout(r,2000));}
  }
}

(async function(){
  document.querySelectorAll('nav button').forEach(b=>
    b.addEventListener('click',()=>setView(b.dataset.view)));
  S.apiGraph=await j('/ui/api/graph');
  await refreshTraces();
  render();
  watch();
})();
"""


def ui_index_html(engine) -> str:
    """The served page: header + three-pane layout, endpoint table
    rendered server-side (the only server-rendered fragment)."""
    rows = "".join(
        f"<tr><td>{e.method}</td><td><code>{e.path}</code></td>"
        f"<td>{len(e.steps)} step(s)</td></tr>"
        for e in engine.endpoints)
    return (
        "<!doctype html><html><head><title>rulemorph</title>"
        f"<style>{_CSS}</style></head><body>"
        "<header><h1>rulemorph</h1><nav>"
        "<button data-view='overview'>overview</button>"
        "<button data-view='trace'>traces</button>"
        "</nav></header>"
        "<template id='endpoints-tpl'>"
        "<h3>endpoints</h3>"
        "<table><tr><th>method</th><th>path</th><th>steps</th></tr>"
        f"{rows}</table></template>"
        "<main><div id='sidebar'></div><div id='canvas'></div>"
        "<div id='detail'></div></main>"
        f"<script>{_JS}</script></body></html>")
