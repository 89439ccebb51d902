package graft.console

/** The served console (C3 `GET /`): a single-file re-expression of the
  * reference console's behaviors (`/root/reference/resources/public/
  * index.html` + `main.js`, 562 LoC) against the same seven endpoints —
  * server-config discovery, URL-state restore/update (C7), incremental
  * chunk parsing of the streaming search (C6), cancel, default-partition
  * lookup, cached-result replay. The two testable behaviors (C6/C7) also
  * exist as Scala mirrors ([[IncrementalJson]], [[ConsoleState]]) driven
  * headlessly by ConsoleSpec; this page carries the same algorithms in
  * JS, string-aware where the reference's brace counter is naive.
  *
  * The JS itself executes under `tools/console_dom_check.js` — the
  * reference's four puppeteer scenarios (`test-console.js:65-145`:
  * checkIDs, search-some, search-none, topicsRefresh) run against a
  * live server through a minimal DOM shim (no browser ships in this
  * environment, the same constraint that blocks the reference's own
  * harness), streaming a real chunked /search through the incremental
  * parser. ConsoleSpec pins the same inventory and search behaviors
  * in-build; the node tool is the end-to-end complement.
  */
object ConsolePage {
  val Html: String = """<!DOCTYPE html>
<html>
<head>
<meta charset="utf-8">
<title>graft console</title>
<style>
body { font-family: monospace; margin: 2em; }
label { display: inline-block; min-width: 11em; }
.row { margin: 0.3em 0; }
#error { color: #b00; display: none; }
#loading { display: none; }
pre { background: #f4f4f4; padding: 0.5em; overflow-x: auto; }
.help { margin-left: 0.4em; }
#dialog-bg { display: none; position: fixed; inset: 0; background: rgba(0,0,0,0.4); }
#dialog-fg { position: fixed; top: 30%; left: 50%; transform: translate(-50%, -30%);
  background: #fff; padding: 1.5em; max-width: 30em; }
</style>
</head>
<body>
<h2>graft console</h2>
<form id="query-form">
  <div class="row"><label>bootstrap-servers</label><select id="bootstrap-servers"></select></div>
  <div class="row"><label>topic</label><select id="topic"></select></div>
  <div class="row"><label>key regex</label><input id="key" size="40">
    <button type="button" id="default-partition-lookup">Lookup</button>
    <span id="default-partition-result"></span>
    <button type="button" class="help" id="help-key">?</button></div>
  <div class="row"><label>value regex</label><input id="val-regex" size="40">
    <button type="button" class="help" id="help-value">?</button></div>
  <div class="row"><label>relative offset</label><input id="relative-offset" size="12">
    <button type="button" class="help" id="help-offset">?</button></div>
  <div class="row"><label>partitions (csv)</label><input id="partitions" size="12">
    <button type="button" class="help" id="help-partition-csv">?</button></div>
  <div class="row"><label>key deserializer</label><select id="key-deserializer"></select></div>
  <div class="row"><label>value deserializer</label><select id="value-deserializer"></select></div>
  <div class="row"><label>schema registry</label><select id="schema-registry-url"></select></div>
  <div class="row"><label>follow</label><input type="checkbox" id="follow">
    <button type="button" class="help" id="help-follow">?</button>
    <label>default partition</label><input type="checkbox" id="default-partition">
    <button type="button" class="help" id="help-partition">?</button></div>
  <div class="row">
    <button type="button" id="submit">Search</button>
    <button type="button" id="cancel">Cancel</button>
    <button type="button" id="curl">curl</button>
  </div>
</form>
<div id="error"></div>
<div id="loading">searching&hellip; partition=<span id="loading-partition"></span>
  offset=<span id="loading-offset"></span> timestamp=<span id="loading-timestamp"></span>
  results=<span id="loading-num-results"></span></div>
<div id="dialog-bg"><div id="dialog-fg"><span id="dialog-text"></span></div></div>
<pre id="curl-out" style="display:none"></pre>
<div id="results"></div>
<script>
(function() {
  'use strict';
  var PIONEER = '[{"type":"pioneer"}';
  var ERROR = '{"error":';
  var xhr = null;
  var parseFrom = PIONEER.length;
  var numResults = 0;
  var bootstrapTopics = {};

  function el(id) { return document.getElementById(id); }

  function state() {
    return {
      key: el('key').value,
      valRegex: el('val-regex').value,
      bootstrapServers: el('bootstrap-servers').value,
      topic: el('topic').value,
      relativeOffset: el('relative-offset').value,
      follow: el('follow').checked,
      defaultPartition: el('default-partition').checked,
      keyDeserializer: el('key-deserializer').value,
      valueDeserializer: el('value-deserializer').value,
      schemaRegistryURL: el('schema-registry-url').value,
      partitions: el('partitions').value
    };
  }

  // C7: the form state IS the URL (shareable query context).
  function updateDataURL() {
    window.history.replaceState(null, null, '?' + JSON.stringify(state()));
  }

  function populateFromUri() {
    var search = window.location.search;
    if (search.length <= 1) return;
    try {
      var s = JSON.parse(decodeURIComponent(search.substr(1)));
      el('key').value = s.key || '';
      el('val-regex').value = s.valRegex || '';
      el('relative-offset').value = s.relativeOffset || '';
      el('partitions').value = s.partitions || '';
      el('follow').checked = !!s.follow;
      el('default-partition').checked = !!s.defaultPartition;
      ['bootstrap-servers', 'topic', 'key-deserializer', 'value-deserializer',
       'schema-registry-url'].forEach(function(id) {
        var want = {'bootstrap-servers': s.bootstrapServers, 'topic': s.topic,
          'key-deserializer': s.keyDeserializer,
          'value-deserializer': s.valueDeserializer,
          'schema-registry-url': s.schemaRegistryURL}[id];
        var sel = el(id);
        for (var i = 0; i < sel.length; i++)
          if (sel[i].value === want) { sel.selectedIndex = i; break; }
      });
    } catch (e) { /* malformed shared URL: start clean */ }
  }

  function searchPath(endpoint) {
    var s = state();
    var args = [['bootstrap-servers', s.bootstrapServers], ['topics', s.topic],
      ['print-offset', '10000']];
    if (s.key) args.push(['key-regex', s.key]);
    // value is contains-match, key stays exact (reference console quirk)
    if (s.valRegex) args.push(['val-regex', '.*' + s.valRegex + '.*']);
    if (s.keyDeserializer) args.push(['key-deserializer', s.keyDeserializer]);
    if (s.valueDeserializer) args.push(['value-deserializer', s.valueDeserializer]);
    if (s.schemaRegistryURL) args.push(['schema-registry-url', s.schemaRegistryURL]);
    if (s.relativeOffset) args.push(['relative-offset', s.relativeOffset]);
    if (s.follow) args.push(['follow', 'true']);
    if (s.defaultPartition) args.push(['default-partition', 'true']);
    if (s.partitions) args.push(['partitions', s.partitions]);
    return encodeURI('/' + endpoint + '?' + args.map(function(kv) {
      return kv[0] + '=' + kv[1];
    }).join('&'));
  }

  function processJson(jsonStr) {
    try {
      var o = JSON.parse(jsonStr);
      if (o.type === 'result') {
        var pre = document.createElement('pre');
        pre.innerText = JSON.stringify(o, null, 4);
        el('results').prepend(document.createElement('hr'));
        el('results').prepend(pre);
        numResults++;
      }
      el('loading-partition').innerHTML = o.partition;
      el('loading-offset').innerHTML = o.offset;
      el('loading-timestamp').innerHTML = o.timestamp;
      el('loading-num-results').innerHTML = numResults;
    } catch (e) { /* incomplete object: wait for more data */ }
  }

  // C6: incremental brace-depth extraction over the growing response;
  // string-aware, so braces inside record values stay data.
  function processChunks(data) {
    var depth = 0, inStr = false, esc = false;
    for (var i = parseFrom; i < data.length; i++) {
      var c = data.charAt(i);
      if (inStr) {
        if (esc) esc = false;
        else if (c === '\\') esc = true;
        else if (c === '"') inStr = false;
      } else if (c === '"') inStr = true;
      else if (c === '{') { if (depth === 0) parseFrom = i; depth++; }
      else if (c === '}') {
        depth--;
        if (depth === 0) { processJson(data.substring(parseFrom, i + 1)); parseFrom = i + 1; }
      }
    }
  }

  function submitQuery() {
    el('error').style.display = 'none';
    el('results').innerHTML = '';
    el('loading').style.display = 'block';
    updateDataURL();
    parseFrom = PIONEER.length;
    numResults = 0;
    xhr = new XMLHttpRequest();
    xhr.open('GET', searchPath('search'), true);
    xhr.onprogress = function() {
      if (xhr.responseText.lastIndexOf(ERROR, 0) === 0) {
        el('loading').style.display = 'none';
        el('error').innerText = xhr.responseText;
        el('error').style.display = 'block';
      } else if (xhr.responseText.lastIndexOf(PIONEER, 0) === 0) {
        processChunks(xhr.responseText);
      }
    };
    xhr.onloadend = function() { el('loading').style.display = 'none'; };
    xhr.send();
  }

  function cancelQuery() { if (xhr) xhr.abort(); el('loading').style.display = 'none'; }

  function defaultPartitionLookup() {
    fetch('/default-partition?topic=' + encodeURIComponent(el('topic').value) +
          '&key=' + encodeURIComponent(el('key').value))
      .then(function(r) { return r.text(); })
      .then(function(t) { el('default-partition-result').innerText = t; });
  }

  function fillSelect(id, values) {
    var sel = el(id);
    sel.innerHTML = '';
    (values || []).forEach(function(v) {
      var o = document.createElement('option');
      o.value = v; o.innerText = v; sel.appendChild(o);
    });
  }

  function loadServerConfigs(done) {
    fetch('/server-configs').then(function(r) { return r.json(); }).then(function(cfg) {
      bootstrapTopics = cfg['bootstrap-topics'] || {};
      fillSelect('bootstrap-servers', cfg['bootstrap-servers']);
      fillSelect('key-deserializer', cfg['key-deserializers']);
      fillSelect('value-deserializer', cfg['value-deserializers']);
      var regs = cfg['schema-registry-urls'];
      fillSelect('schema-registry-url',
        regs ? [''].concat(Object.keys(regs).map(function(k) { return regs[k]; })) : ['']);
      fillSelect('topic', bootstrapTopics[el('bootstrap-servers').value]);
      done();
    });
  }

  window.onload = function() {
    loadServerConfigs(function() {
      populateFromUri();
      var elements = el('query-form').elements;
      for (var i = 0; i < elements.length; i++) elements[i].onchange = updateDataURL;
      el('bootstrap-servers').onchange = function() {
        updateDataURL();
        fillSelect('topic', bootstrapTopics[el('bootstrap-servers').value]);
      };
      el('query-form').onsubmit = function(e) { e.preventDefault(); };
      el('submit').onclick = submitQuery;
      el('cancel').onclick = cancelQuery;
      el('curl').onclick = function() {
        el('curl-out').style.display = 'block';
        el('curl-out').innerText = 'curl \'' + window.location.origin +
          searchPath('search') + '\'';
      };
      el('default-partition-lookup').onclick = defaultPartitionLookup;
      var helpText = {
        'help-key': 'Full-match regex over the record key (anchored: "k1" ' +
          'matches only the exact key k1; use .*k1.* to contain-match).',
        'help-value': 'Contain-match over the string rendering of the value ' +
          '(wrapped in .* ... .* before submit).',
        'help-offset': 'Signed offset relative to the partition end (negative, ' +
          'e.g. -1000) or beginning (positive). Empty scans from the start.',
        'help-follow': 'Keep the search open and stream new records as they ' +
          'arrive (unbounded tail); cancel to stop.',
        'help-partition': 'Search only the partition the key hashes to ' +
          '(murmur2, like the default Kafka producer partitioner).',
        'help-partition-csv': 'Comma-separated explicit partition list, e.g. ' +
          '0,3,7. Empty searches all partitions.'
      };
      Object.keys(helpText).forEach(function(id) {
        el(id).onclick = function() {
          el('dialog-text').innerText = helpText[id];
          el('dialog-bg').style.display = 'block';
        };
      });
      el('dialog-bg').onclick = function() { el('dialog-bg').style.display = 'none'; };
    });
  };
})();
</script>
</body>
</html>
"""
}
