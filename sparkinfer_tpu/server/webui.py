"""Built-in chat web UI (parity: tools/server webui + the SparkInfer
launcher's chat page, tools/launcher). Single self-contained HTML page
talking to /v1/chat/completions with SSE streaming."""

INDEX_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>sparkinfer-tpu</title>
<style>
 body{font-family:system-ui,sans-serif;max-width:760px;margin:2rem auto;padding:0 1rem;background:#111;color:#eee}
 h1{font-size:1.1rem;color:#7fd}
 #log{border:1px solid #333;border-radius:8px;padding:1rem;min-height:300px;white-space:pre-wrap}
 .u{color:#9cf}.a{color:#dfd}
 #row{display:flex;gap:.5rem;margin-top:1rem}
 input,button{font-size:1rem;padding:.5rem;border-radius:6px;border:1px solid #444;background:#222;color:#eee}
 input{flex:1}
 #meta{color:#888;font-size:.8rem;margin-top:.5rem}
</style></head><body>
<h1>sparkinfer-tpu</h1>
<div id="log"></div>
<div id="row"><input id="msg" placeholder="message..." autofocus>
<button onclick="send()">send</button></div>
<div id="meta"></div>
<script>
const hist=[];
async function send(){
  const inp=document.getElementById('msg');
  const text=inp.value.trim(); if(!text)return;
  inp.value='';
  hist.push({role:'user',content:text});
  append('u','you: '+text+'\\n');
  const t0=performance.now();
  const res=await fetch('/v1/chat/completions',{method:'POST',
    headers:{'Content-Type':'application/json'},
    body:JSON.stringify({messages:hist,stream:true,max_tokens:256})});
  const reader=res.body.getReader(); const dec=new TextDecoder();
  let buf='',out='';
  append('a','model: ');
  for(;;){
    const {value,done}=await reader.read(); if(done)break;
    buf+=dec.decode(value,{stream:true});
    for(const line of buf.split('\\n')){
      if(!line.startsWith('data: '))continue;
      const payload=line.slice(6);
      if(payload==='[DONE]')continue;
      try{
        const d=JSON.parse(payload);
        const ch=d.choices[0], dl=ch.delta||{};
        const delta=dl.content??ch.text??'';
        out+=delta; appendLast(delta);
        if(dl.reasoning_content)appendLast('‹'+dl.reasoning_content+'›');
        for(const tc of dl.tool_calls||[]){
          const fn=tc.function||{};
          if(fn.name)appendLast('\n[tool → '+fn.name+'(');
          if(fn.arguments)appendLast(fn.arguments);
        }
        if(ch.finish_reason==='tool_calls')appendLast(')]');
      }catch(e){}
    }
    buf=buf.slice(buf.lastIndexOf('\\n')+1);
  }
  append('a','\\n');
  hist.push({role:'assistant',content:out});
  document.getElementById('meta').textContent=
    `${out.length} chars in ${((performance.now()-t0)/1000).toFixed(1)}s`;
}
function append(cls,t){
  const s=document.createElement('span');s.className=cls;s.textContent=t;
  document.getElementById('log').appendChild(s);
}
function appendLast(t){
  const log=document.getElementById('log');
  log.lastChild.textContent+=t;
}
document.getElementById('msg').addEventListener('keydown',e=>{if(e.key==='Enter')send()});
</script></body></html>
"""
