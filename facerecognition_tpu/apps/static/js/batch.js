// Batch page: selected-file counter + drag-and-drop.
(() => {
  const input = document.getElementById('batchinput');
  const zone = document.getElementById('dropzone');
  const count = document.getElementById('filecount');

  const update = () => {
    const n = input.files.length;
    count.textContent = n ? `${n} image${n > 1 ? 's' : ''} selected` : '';
  };
  input.addEventListener('change', update);

  ['dragover', 'dragenter'].forEach((ev) =>
    zone.addEventListener(ev, (e) => {
      e.preventDefault();
      zone.classList.add('drag');
    }));
  ['dragleave', 'drop'].forEach((ev) =>
    zone.addEventListener(ev, (e) => {
      e.preventDefault();
      zone.classList.remove('drag');
    }));
  zone.addEventListener('drop', (e) => {
    if (e.dataTransfer.files.length) {
      input.files = e.dataTransfer.files;
      update();
    }
  });
})();
